"""Multi-device SPMD tests on the virtual 8-device CPU mesh (conftest)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from loam_tpu import LidarParams, odometry_offline
from loam_tpu.params import FeatureExtractionParams, RegistrationParams
from loam_tpu.parallel import (
    extract_features_sharded,
    make_mesh,
    odometry_offline_sharded,
)
from loam_tpu.io import render_trajectory

LIDAR = LidarParams(8, 128, 0.5, 80.0)
FEAT = FeatureExtractionParams(number_sectors=2)
REG = RegistrationParams(max_iterations=2, min_associations=10)


@pytest.fixture(scope="module")
def scans():
    s, _ = render_trajectory(
        LIDAR, 8, step=np.array([0.05, 0.0, 0.0]), noise=0.003, seed=5,
        dtype=np.float32,
    )
    return jnp.asarray(s)


def test_devices_available():
    assert len(jax.devices()) == 8


def test_sharded_extraction_matches_single(scans):
    mesh = make_mesh(line_axis=2)
    sharded = extract_features_sharded(scans, LIDAR, mesh, FEAT)
    from loam_tpu import extract_features

    single = jax.vmap(lambda s: extract_features(s, LIDAR, FEAT))(scans)
    np.testing.assert_allclose(
        np.asarray(sharded.edge_points), np.asarray(single.edge_points), atol=1e-6
    )
    np.testing.assert_array_equal(
        np.asarray(sharded.planar_mask), np.asarray(single.planar_mask)
    )


def test_sharded_odometry_matches_single(scans):
    mesh = make_mesh(line_axis=1)
    traj_sh, _ = odometry_offline_sharded(scans, LIDAR, mesh, FEAT, REG)
    traj, _ = odometry_offline(scans, LIDAR, FEAT, REG)
    np.testing.assert_allclose(
        np.asarray(traj_sh.translation), np.asarray(traj.translation), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(traj_sh.rotation), np.asarray(traj.rotation), atol=1e-5
    )


def test_sharded_odometry_2d_mesh(scans):
    mesh = make_mesh(line_axis=2)
    traj_sh, _ = odometry_offline_sharded(scans, LIDAR, mesh, FEAT, REG)
    traj, _ = odometry_offline(scans, LIDAR, FEAT, REG)
    np.testing.assert_allclose(
        np.asarray(traj_sh.translation), np.asarray(traj.translation), atol=1e-5
    )
