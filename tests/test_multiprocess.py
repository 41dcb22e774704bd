"""Multi-process distributed test: a real ``jax.distributed`` fake cluster.

Launches N local CPU processes (SURVEY §4's fake-cluster recipe — the
coordinator/DCN code path virtual single-process meshes never touch), each
owning a shard of a pose-graph edge set, and runs the psum-reduced
distributed Gauss-Newton solve (``optimize_pose_graph_sharded``) across
them. Every process checks the distributed result against its local
single-device solve; the test asserts all workers exit cleanly.
"""

import os
import socket
import subprocess
import sys

import pytest

_HERE = os.path.dirname(os.path.abspath(__file__))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _run_cluster(mode: str, nproc: int = 2, devices_per_proc: int = 2):
    port = _free_port()
    repo_root = os.path.dirname(_HERE)
    env = dict(os.environ)
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={devices_per_proc}"
    ).strip()
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("JAX_NUM_PROCESSES", None)
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(_HERE, "multiproc_worker.py"),
             str(pid), str(nproc), str(port), mode],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
            cwd=os.path.dirname(_HERE),
        )
        for pid in range(nproc)
    ]
    outputs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=540)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outputs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outputs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out}"
        assert f"[proc {pid}] OK" in out, out


def test_multiprocess_pose_graph_parity():
    _run_cluster("pose_graph")


def test_multiprocess_scan_to_map_parity():
    """The FULL mapping pipeline (extraction -> collective-kNN registration
    -> owner-partitioned map insert) across a real 2-process jax.distributed
    cluster — the DCN code path single-process virtual meshes never touch —
    must track the process-local single-device driver frame by frame."""
    _run_cluster("scan_to_map", devices_per_proc=1)
