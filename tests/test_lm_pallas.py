"""Pallas LM kernel vs the XLA lm_solve — same solve, f32-tolerance equality.

The kernel mirrors solver.py's formulas and step logic exactly; only the
reduction order differs, so poses match to f32 round-off (not bitwise).
Interpret mode runs the kernel body on CPU.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from loam_tpu.geometry import Pose3, quat_exp
from loam_tpu.params import RegistrationParams
from loam_tpu.registration.associate import EdgeAssociations, PlaneAssociations
from loam_tpu.registration.solver import _Problem, lm_solve


def _make_problem(rng, e=64, q=96, gt_rot=(0.02, -0.01, 0.03),
                  gt_t=(0.05, -0.04, 0.02), noise=0.0, prior=False):
    gt = Pose3(quat_exp(jnp.asarray(gt_rot, jnp.float32)),
               jnp.asarray(gt_t, jnp.float32))
    pts_e = jnp.asarray(rng.uniform(-5, 5, (e, 3)).astype(np.float32))
    moved_e = gt.act(pts_e)
    dirs = rng.standard_normal((e, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    ea = EdgeAssociations(
        line_a=moved_e + jnp.asarray(dirs),
        line_b=moved_e - jnp.asarray(dirs),
        valid=jnp.ones((e,), bool),
        match=jnp.zeros((e,), jnp.int32),
    )
    pts_p = jnp.asarray(rng.uniform(-5, 5, (q, 3)).astype(np.float32))
    moved_p = gt.act(pts_p)
    normals = rng.standard_normal((q, 3)).astype(np.float32)
    normals /= np.linalg.norm(normals, axis=1, keepdims=True)
    normals = jnp.asarray(normals)
    d = jnp.sum(normals * moved_p, axis=1)
    if noise:
        d = d + jnp.asarray(rng.normal(0, noise, (q,)).astype(np.float32))
    pa = PlaneAssociations(
        normal=normals, d=d,
        valid=jnp.ones((q,), bool),
        match=jnp.zeros((q,), jnp.int32),
    )
    prior_offset = (
        Pose3(quat_exp(jnp.asarray([0.01, 0.0, -0.02], jnp.float32)),
              jnp.asarray([0.1, 0.0, 0.05], jnp.float32))
        if prior else Pose3.identity(jnp.float32)
    )
    return _Problem(pts_edge=pts_e, edge=ea, pts_plane=pts_p, plane=pa,
                    prior_offset=prior_offset), gt


def _solve_both(problem, params):
    xla = dataclasses.replace(params, lm_impl="xla")
    pls = dataclasses.replace(params, lm_impl="pallas")
    d_x, c_x = jax.jit(lambda p: lm_solve(p, xla))(problem)
    d_p, c_p = jax.jit(lambda p: lm_solve(p, pls))(problem)
    return (d_x, c_x), (d_p, c_p)


@pytest.mark.parametrize("noise,prior_w", [(0.0, 0.0), (0.01, 0.0), (0.01, 50.0)])
def test_kernel_matches_xla_solver(noise, prior_w):
    rng = np.random.default_rng(0)
    problem, gt = _make_problem(rng, noise=noise, prior=prior_w > 0)
    params = RegistrationParams(prior_weight=prior_w)
    (d_x, c_x), (d_p, c_p) = _solve_both(problem, params)
    # sign-align quaternions before comparing
    qx, qp = np.asarray(d_x.rotation), np.asarray(d_p.rotation)
    if np.dot(qx, qp) < 0:
        qp = -qp
    np.testing.assert_allclose(qp, qx, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(d_p.translation), np.asarray(d_x.translation), atol=1e-3
    )
    np.testing.assert_allclose(float(c_p), float(c_x), rtol=5e-3, atol=1e-4)


def test_kernel_recovers_ground_truth():
    rng = np.random.default_rng(1)
    problem, gt = _make_problem(rng)
    params = RegistrationParams(lm_impl="pallas")
    delta, cost = jax.jit(lambda p: lm_solve(p, params))(problem)
    np.testing.assert_allclose(
        np.asarray(delta.translation), np.asarray(gt.translation), atol=1e-3
    )
    qd, qg = np.asarray(delta.rotation), np.asarray(gt.rotation)
    if np.dot(qd, qg) < 0:
        qd = -qd
    np.testing.assert_allclose(qd, qg, atol=1e-3)


def test_kernel_under_vmap():
    rng = np.random.default_rng(2)
    p1, _ = _make_problem(rng)
    p2, _ = _make_problem(rng, gt_rot=(0.0, 0.02, -0.01), gt_t=(-0.03, 0.0, 0.06))
    batch = jax.tree.map(lambda a, b: jnp.stack([a, b]), p1, p2)
    params = RegistrationParams()

    def both(impl):
        pp = dataclasses.replace(params, lm_impl=impl)
        return jax.jit(jax.vmap(lambda p: lm_solve(p, pp)))(batch)

    d_x, c_x = both("xla")
    d_p, c_p = both("pallas")
    tx, tp = np.asarray(d_x.translation), np.asarray(d_p.translation)
    np.testing.assert_allclose(tp, tx, atol=1e-3)
    np.testing.assert_allclose(np.asarray(c_p), np.asarray(c_x), rtol=5e-3, atol=1e-4)


def test_invalid_rows_ignored():
    rng = np.random.default_rng(3)
    problem, gt = _make_problem(rng)
    # poison half the rows with NaN but mark them invalid
    bad_e = np.array(problem.edge.line_a)
    bad_e[::2] = np.nan
    ea = problem.edge._replace(
        line_a=jnp.asarray(bad_e),
        valid=jnp.asarray(np.arange(64) % 2 == 1),
    )
    problem = problem._replace(edge=ea)
    params = RegistrationParams(lm_impl="pallas")
    delta, cost = jax.jit(lambda p: lm_solve(p, params))(problem)
    assert np.isfinite(np.asarray(delta.translation)).all()
    assert np.isfinite(float(cost))


def test_kernel_inside_full_icf_loop():
    """lm_impl='pallas' through register_features (cond + while_loop
    machinery): the round trip must recover the pose to the reference
    tolerances, matching the xla impl's convergence quality."""
    from loam_tpu import (
        RegistrationParams as RP, feature_set_from_points, register_features,
    )
    from loam_tpu.geometry import quat_from_axis_angle, quat_rotate
    from tests.test_registration import simple_scene, transform_features

    edge, planar = simple_scene()
    gt = Pose3(
        quat_from_axis_angle(jnp.asarray([0.0, 0.0, 1.0]), 0.04),
        jnp.asarray([0.05, -0.02, 0.01]),
    )
    # f32: the kernel's dtype (auto falls back to xla for f64)
    target = feature_set_from_points(edge, planar, dtype=jnp.float32)
    source = feature_set_from_points(
        transform_features(edge, gt), transform_features(planar, gt),
        dtype=jnp.float32,
    )
    est, detail = register_features(
        source, target, None, RP(lm_impl="pallas")
    )
    err_t = np.asarray(quat_rotate(gt.rotation, est.translation) + gt.translation)
    np.testing.assert_allclose(err_t, 0.0, atol=2e-3)
    assert int(detail.termination) == 0  # CONVERGED
