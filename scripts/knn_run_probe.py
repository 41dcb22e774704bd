"""Decompose knn_run (query-side) cost at scan scale on TPU.

knn_kernel_probe showed per-call time flat in k => XLA-level work dominates.
With target prep hoisted, what remains per ICF iteration is knn_run:
q transpose/pad, per-tile boxes + active-list argsort, the kernel itself,
and the output transposes/sqrt. This times each piece standalone (device
timer), plus knn_run whole, to rank them.

Run: python scripts/knn_run_probe.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from loam_tpu.profiling import device_time


def main():
    from loam_tpu import LidarParams, extract_features
    from loam_tpu.params import FeatureExtractionParams, RegistrationParams
    from loam_tpu.io import render_trajectory
    from loam_tpu.ops.knn_pallas import knn_prep, knn_run, _auto_tiles
    from loam_tpu.registration.icf import azimuth_sort_features

    print("devices:", jax.devices(), flush=True)
    lidar = LidarParams(64, 1024, 0.5, 120.0)
    reg = RegistrationParams()
    scans, _ = render_trajectory(
        lidar, 2, step=np.array([0.08, 0.02, 0.0]), yaw_rate=0.01,
        noise=0.005, seed=0, dtype=np.float32,
    )
    scans = jnp.asarray(scans)
    fs0 = azimuth_sort_features(
        extract_features(scans[0], lidar, FeatureExtractionParams())
    )
    fs1 = azimuth_sort_features(
        extract_features(scans[1], lidar, FeatureExtractionParams())
    )
    q = fs1.planar_points
    t = fs0.planar_points
    tm = fs0.planar_mask
    r = float(reg.max_plane_neighbor_dist)
    k = reg.num_plane_neighbors
    M = t.shape[0]
    tq, tt = _auto_tiles(M)
    mpad = max(-(-M // tt) * tt, tt)
    qpad = -(-q.shape[0] // tq) * tq
    n_tiles, n_chunks = qpad // tq, mpad // tt
    print(f"Q={q.shape[0]} M={M} tq={tq} tt={tt} tiles={n_tiles} "
          f"chunks={n_chunks}", flush=True)

    def tm_case(name, fn, x, n=30):
        dt = device_time(fn, x, n_inner=n, reps=2)
        print(f"{name:45s} {dt*1e3:8.3f} ms", flush=True)
        return dt

    from loam_tpu.ops.knn_pallas import TargetPrep

    arrs = jax.jit(lambda tt_, m_: tuple(knn_prep(tt_, m_)[:4]))(t, tm)
    jax.block_until_ready(arrs)
    # int fields must stay Python ints (static shape metadata)
    prep = TargetPrep(*arrs, m=M, tt=tt)

    tm_case("knn_prep (target side)", lambda x: knn_prep(x, tm).tT, t)
    tm_case(
        "knn_run (whole, prep prebuilt)",
        lambda x: knn_run(prep, x, k, r).distances,
        q,
    )
    tm_case("q transpose+pad", lambda x: jnp.pad(
        x.T, ((0, 0), (0, qpad - x.shape[0]))), q)

    def boxes_and_lists(x):
        qT = jnp.pad(x.T, ((0, 0), (0, qpad - x.shape[0])))
        qch = qT.reshape(3, n_tiles, tq)
        qvalid = (jnp.arange(qpad) < x.shape[0]).reshape(1, n_tiles, tq)
        big = jnp.asarray(3e37, jnp.float32)
        qlo = jnp.min(jnp.where(qvalid, qch, big), axis=2)
        qhi = jnp.max(jnp.where(qvalid, qch, -big), axis=2)
        gap = jnp.maximum(
            jnp.maximum(
                qlo.T[:, None, :] - prep.bhi.T[None, :, :],
                prep.blo.T[None, :, :] - qhi.T[:, None, :],
            ), 0.0)
        sep2 = jnp.sum(gap * gap, axis=-1)
        active = sep2 < jnp.asarray(r * r, jnp.float32)
        lst = jnp.argsort(~active, axis=1, stable=True).astype(jnp.int32)
        cnt = jnp.sum(active, axis=1, dtype=jnp.int32)[:, None]
        return lst, cnt

    tm_case("q boxes + active-list argsort", lambda x: boxes_and_lists(x)[0], q)

    d2kq = jnp.abs(jnp.ones((k, q.shape[0]), jnp.float32))
    tm_case("output transpose+sqrt+where (x1)", lambda x: jnp.sqrt(
        jnp.maximum(x.T, 0.0)), d2kq)

    # association-side gather for comparison
    idx = jnp.zeros((q.shape[0], k), jnp.int32)
    tm_case("neighbor gather t[idx] (Q x k rows)", lambda x: t[
        (idx + (x[0, 0] > 0).astype(jnp.int32))], q)


if __name__ == "__main__":
    main()
