from .curvature import compute_curvature, compute_valid_points, validate_scan
from .extract import (
    extract_features,
    extract_features_batch,
    extract_features_given,
)
from .types import FeatureSet, feature_set_from_points

__all__ = [
    "compute_curvature",
    "compute_valid_points",
    "validate_scan",
    "extract_features",
    "extract_features_given",
    "FeatureSet",
    "feature_set_from_points",
]
