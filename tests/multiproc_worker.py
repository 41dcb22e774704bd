"""Worker for the multi-process distributed test (SURVEY §4 fake cluster).

Launched N times by ``test_multiprocess.py``:

    python multiproc_worker.py <process_id> <num_processes> <port>

Each process pins the CPU backend, joins the ``jax.distributed`` coordinator
(process 0 hosts it), builds the SAME pose-graph problem deterministically,
shards the edge set over the global ("data",) mesh with its process-local
shard, runs ``optimize_pose_graph_sharded`` (collective normal-equation
psums ride the cross-process channel), and checks the result against the
process-local single-device solve. Exit code 0 = parity held.
"""

import sys


def main():
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])

    import jax

    # the ambient sitecustomize pins an "axon" remote-TPU platform; the fake
    # cluster must run on local CPU devices
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=nproc,
        process_id=pid,
    )

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from loam_tpu.geometry import Pose3, quat_from_axis_angle
    from loam_tpu.pose_graph import (
        PoseGraphEdges,
        optimize_pose_graph,
        optimize_pose_graph_sharded,
    )

    D = len(jax.devices())
    assert D == nproc * len(jax.local_devices())
    mesh = Mesh(np.asarray(jax.devices()).reshape(D), ("data",))

    # deterministic problem, identical on every process: a noisy ring of
    # N nodes with odometry edges + one loop closure
    N = 8
    rng = np.random.default_rng(0)
    angles = np.linspace(0, 2 * np.pi, N, endpoint=False)
    gt_t = np.stack([np.cos(angles), np.sin(angles), 0 * angles], axis=1)
    init_t = gt_t + rng.normal(scale=0.05, size=gt_t.shape)
    init = Pose3(
        jnp.tile(jnp.asarray([1.0, 0, 0, 0]), (N, 1)), jnp.asarray(init_t)
    )

    idx_i, idx_j, mq, mt = [], [], [], []
    for a in range(N):
        b = (a + 1) % N
        idx_i.append(a)
        idx_j.append(b)
        mq.append([1.0, 0, 0, 0])
        mt.append(gt_t[b] - gt_t[a])
    E = len(idx_i)
    cap = -(-E // D) * D  # pad to shard-divisible
    pad = cap - E

    def pad0(x, value=0):
        x = np.asarray(x)
        return np.concatenate([x, np.full((pad,) + x.shape[1:], value, x.dtype)])

    edges_np = dict(
        i=pad0(idx_i).astype(np.int32),
        j=pad0(idx_j).astype(np.int32),
        mq=pad0(mq, 0.0),
        mt=pad0(mt, 0.0),
        w=pad0(np.ones(E), 0.0),
        m=pad0(np.ones(E, bool), False),
    )
    edges_np["mq"][E:, 0] = 1.0  # identity quats in padded slots

    # single-device reference (process-local arrays, no collectives)
    edges_local = PoseGraphEdges(
        jnp.asarray(edges_np["i"]),
        jnp.asarray(edges_np["j"]),
        Pose3(jnp.asarray(edges_np["mq"]), jnp.asarray(edges_np["mt"])),
        jnp.asarray(edges_np["w"]),
        jnp.asarray(edges_np["m"]),
    )
    ref_poses, ref_cost = optimize_pose_graph(init, edges_local, iterations=5)
    ref_t = np.asarray(ref_poses.translation)

    # global sharded edge set: every process contributes its local rows
    sh = NamedSharding(mesh, P("data"))
    rep = NamedSharding(mesh, P())

    def gshard(x):
        x = np.asarray(x)
        return jax.make_array_from_callback(
            x.shape, sh, lambda idx: x[idx]
        )

    def grep(x):
        x = np.asarray(x)
        return jax.make_array_from_callback(
            x.shape, rep, lambda idx: x[idx]
        )

    edges_g = PoseGraphEdges(
        gshard(edges_np["i"]),
        gshard(edges_np["j"]),
        Pose3(gshard(edges_np["mq"]), gshard(edges_np["mt"])),
        gshard(edges_np["w"]),
        gshard(edges_np["m"]),
    )
    init_g = Pose3(grep(np.asarray(init.rotation)), grep(np.asarray(init.translation)))

    poses, cost = jax.jit(
        lambda ini, e: optimize_pose_graph_sharded(ini, e, mesh, iterations=5)
    )(init_g, edges_g)
    # the sharded solver returns replicated (fully-addressable) outputs
    got_t = np.asarray(poses.translation)

    err = np.abs(got_t - ref_t).max()
    cost_err = abs(float(cost) - float(ref_cost))
    print(f"[proc {pid}] max|dt|={err:.3e} dcost={cost_err:.3e}", flush=True)
    assert err < 1e-8, err
    assert cost_err < 1e-10, cost_err
    print(f"[proc {pid}] OK", flush=True)


if __name__ == "__main__":
    main()
