"""Host-side IO: synthetic scan rendering + native readers/loader.

``synthetic`` renders procedural structured-LiDAR scans (tests, benches,
demos). ``native`` wraps the C++ IO runtime (PCD/KITTI readers, spherical
range-image projection, threaded prefetch loader) with NumPy fallbacks.
"""

from .native import (
    ScanLoader,
    native_available,
    project_range_image,
    read_kitti_bin,
    read_pcd,
    write_pcd,
)
from .packed import (
    PACKED_R_MAX,
    decode_packed,
    encode_packed_grid,
    project_packed_numpy,
)
from .synthetic import Box, default_world, render_scan, render_trajectory

__all__ = [
    "Box",
    "PACKED_R_MAX",
    "ScanLoader",
    "decode_packed",
    "default_world",
    "encode_packed_grid",
    "native_available",
    "project_packed_numpy",
    "project_range_image",
    "read_kitti_bin",
    "read_pcd",
    "render_scan",
    "write_pcd",
    "render_trajectory",
]
