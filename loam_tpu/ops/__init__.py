"""Hand-written TPU kernels (Pallas) for the hot ops.

Everything here has a pure-XLA equivalent in the library (used on CPU and as
the correctness oracle); the Pallas versions exist purely for speed-of-light
on TPU where XLA's lowering is poor (e.g. top-k via full bitonic sort,
HBM-materialized distance matrices).
"""

from .knn_pallas import knn_pallas, pallas_supported

__all__ = ["knn_pallas", "pallas_supported"]
