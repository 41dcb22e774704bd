"""Dewarping tests: motion-compensated scans recover the end-of-sweep frame."""

import numpy as np

import jax.numpy as jnp

from loam_tpu import LidarParams, extract_features, register_features
from loam_tpu.dewarp import dewarp_scan
from loam_tpu.geometry import Pose3, quat_from_axis_angle
from loam_tpu.io import render_scan
from loam_tpu.io.synthetic import render_scan_swept

LIDAR = LidarParams(16, 360, 0.5, 80.0)
Z = jnp.asarray([0.0, 0.0, 1.0])


def _swept(begin_pos, begin_yaw, end_pos, end_yaw, **kw):
    return render_scan_swept(
        LIDAR, np.asarray(begin_pos, float), begin_yaw,
        np.asarray(end_pos, float), end_yaw, dtype=np.float32, **kw,
    )


def test_dewarp_recovers_exact_end_frame():
    begin = np.zeros(3)
    end = np.array([0.25, 0.1, 0.0])
    yaw0, yaw1 = 0.0, 0.06
    warped, exact = _swept(begin, yaw0, end, yaw1)
    # begin_T_end: rotation by (yaw1-yaw0), translation of end in begin frame
    c, s = np.cos(yaw0), np.sin(yaw0)
    t_rel = np.array([c * (end - begin)[0] + s * (end - begin)[1],
                      -s * (end - begin)[0] + c * (end - begin)[1], 0.0])
    delta = Pose3(
        quat_from_axis_angle(Z, yaw1 - yaw0).astype(jnp.float32),
        jnp.asarray(t_rel, jnp.float32),
    )
    out = np.asarray(dewarp_scan(jnp.asarray(warped), delta, LIDAR))
    err_before = np.linalg.norm(warped - exact, axis=-1)
    err_after = np.linalg.norm(out - exact, axis=-1)
    r = np.linalg.norm(exact, axis=-1)
    near = r < 30
    # warped scans are decimeters off; dewarping brings them to mm-cm
    # (linear screw interpolation of the rotation; exact for this motion)
    assert err_before[near].mean() > 0.05
    assert err_after[near].mean() < 0.01
    assert err_after[near].max() < 0.05


def test_dewarp_identity_is_noop():
    scan = render_scan(LIDAR, noise=0.0, seed=1, dtype=np.float32)
    out = np.asarray(
        dewarp_scan(jnp.asarray(scan), Pose3.identity(jnp.float32), LIDAR)
    )
    np.testing.assert_allclose(out, scan, atol=1e-6)


def test_dewarp_improves_registration():
    """Registering a warped moving scan against a static previous scan gets
    closer to ground truth after dewarping with the (known) motion."""
    prev = render_scan(LIDAR, np.zeros(3), 0.0, noise=0.003, seed=0,
                       dtype=np.float32)
    begin = np.array([0.0, 0.0, 0.0])
    end = np.array([0.3, 0.05, 0.0])
    warped, exact = _swept(begin, 0.0, end, 0.04, noise=0.003, seed=1)
    delta = Pose3(
        quat_from_axis_angle(Z, 0.04).astype(jnp.float32),
        jnp.asarray(end, jnp.float32),
    )
    f_prev = extract_features(jnp.asarray(prev), LIDAR)

    def err(scan):
        f = extract_features(jnp.asarray(scan), LIDAR)
        est, _ = register_features(f, f_prev, delta)
        e_t = np.linalg.norm(np.asarray(est.translation) - end)
        return e_t

    e_warped = err(warped)
    e_dewarped = err(np.asarray(dewarp_scan(jnp.asarray(warped), delta, LIDAR)))
    assert e_dewarped < e_warped
    assert e_dewarped < 0.02, (e_warped, e_dewarped)
