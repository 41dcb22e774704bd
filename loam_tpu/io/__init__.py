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
from .synthetic import Box, default_world, render_scan, render_trajectory

__all__ = [
    "Box",
    "ScanLoader",
    "default_world",
    "native_available",
    "project_range_image",
    "read_kitti_bin",
    "read_pcd",
    "render_scan",
    "write_pcd",
    "render_trajectory",
]
