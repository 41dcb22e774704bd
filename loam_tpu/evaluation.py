"""Trajectory evaluation: ATE / RPE metrics (host-side NumPy).

The reference publishes no quantitative accuracy (SURVEY §6); BASELINE.json
scores this framework on ATE vs the reference on held-out segments. These
are the standard metrics (Sturm et al., TUM RGB-D benchmark conventions):
absolute trajectory error after SE(3) (optionally Sim(3)) Umeyama alignment,
and relative pose error over a fixed frame delta.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def umeyama_alignment(
    est: np.ndarray, ref: np.ndarray, with_scale: bool = False
) -> Tuple[np.ndarray, np.ndarray, float]:
    """Least-squares similarity transform aligning ``est`` to ``ref``.

    Args:
      est/ref: (F, 3) positions.
    Returns: (R (3,3), t (3,), s) minimizing ||ref - (s R est + t)||^2.
    """
    est = np.asarray(est, np.float64)
    ref = np.asarray(ref, np.float64)
    mu_e = est.mean(axis=0)
    mu_r = ref.mean(axis=0)
    ec = est - mu_e
    rc = ref - mu_r
    cov = rc.T @ ec / est.shape[0]
    U, D, Vt = np.linalg.svd(cov)
    S = np.eye(3)
    if np.linalg.det(U) * np.linalg.det(Vt) < 0:
        S[2, 2] = -1.0
    R = U @ S @ Vt
    if with_scale:
        var_e = (ec * ec).sum() / est.shape[0]
        s = float(np.trace(np.diag(D) @ S) / var_e) if var_e > 0 else 1.0
    else:
        s = 1.0
    t = mu_r - s * R @ mu_e
    return R, t, s


def ate_rmse(
    est_positions: np.ndarray,
    ref_positions: np.ndarray,
    align: bool = True,
    with_scale: bool = False,
) -> float:
    """Absolute trajectory error (RMSE over positions, meters)."""
    est = np.asarray(est_positions, np.float64)
    ref = np.asarray(ref_positions, np.float64)
    if align:
        R, t, s = umeyama_alignment(est, ref, with_scale)
        est = (s * (R @ est.T)).T + t
    err = est - ref
    return float(np.sqrt((err * err).sum(axis=1).mean()))


def rpe_rmse(
    est_positions: np.ndarray,
    ref_positions: np.ndarray,
    delta: int = 1,
) -> float:
    """Relative pose (translation drift) error over ``delta`` frames, RMSE."""
    est = np.asarray(est_positions, np.float64)
    ref = np.asarray(ref_positions, np.float64)
    de = est[delta:] - est[:-delta]
    dr = ref[delta:] - ref[:-delta]
    err = np.linalg.norm(de, axis=1) - np.linalg.norm(dr, axis=1)
    return float(np.sqrt((err * err).mean()))
