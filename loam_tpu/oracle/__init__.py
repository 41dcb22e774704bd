from .oracle import compute_curvature, compute_valid_points, extract_features

__all__ = ["compute_curvature", "compute_valid_points", "extract_features"]
