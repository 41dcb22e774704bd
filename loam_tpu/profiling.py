"""Profiling / tracing utilities (SURVEY §5: absent in the reference).

Two tools:

  * :func:`trace` — context manager around ``jax.profiler`` writing a
    TensorBoard-loadable device trace.
  * :func:`device_time` — amortized device timing of a jitted function.
    Remote-attached TPUs cost tens of ms per dispatch, so the op is repeated
    N times inside one compiled ``lax.scan`` whose carry perturbs the input
    (defeating CSE/hoisting) and the dispatch overhead divides away.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax
import jax.numpy as jnp
from jax import lax


@contextlib.contextmanager
def trace(log_dir: str):
    """``with trace("/tmp/trace"):`` — device trace for TensorBoard."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def force(tree) -> None:
    """TRUE completion barrier: device->host read of one scalar per leaf.

    ``jax.block_until_ready`` is NOT reliable on remote-attached backends
    (axon): measured here, it sometimes returns in ~0.3 ms for a ~200 ms
    execution (the ready-future resolves on remote acceptance, not
    completion), while a ``np.asarray`` of any element always waits for the
    data. Every timing path in this repo must use this, never
    ``block_until_ready``, or it measures enqueue rate.
    """
    import numpy as np

    for l in jax.tree.leaves(tree):
        if hasattr(l, "dtype") and hasattr(l, "ndim"):
            np.asarray(l.ravel()[:1] if l.ndim else l)


def _roundtrip_s() -> float:
    """Measured dispatch+transfer floor of one forced tiny op (seconds)."""
    f = jax.jit(lambda a: a + 1)
    x = jnp.zeros((), jnp.float32)
    force(f(x))
    t0 = time.perf_counter()
    for _ in range(3):
        force(f(x))
    return (time.perf_counter() - t0) / 3


def device_time(
    fn: Callable,
    x: jax.Array,
    *static_args,
    n_inner: int = 10,
    reps: int = 2,
) -> float:
    """Average seconds per call of ``fn(x, *static_args)`` on device.

    ``fn``'s first argument must be a float array; the measurement loop adds
    a data-dependent ~0 perturbation each iteration so the compiler cannot
    fold the repeats. Returns seconds (compile time excluded).
    """

    def loop(x0):
        def body(carry, _):
            out = fn(x0 + carry, *static_args)
            leaves = [
                l
                for l in jax.tree.leaves(out)
                if hasattr(l, "dtype") and jnp.issubdtype(l.dtype, jnp.floating)
            ]
            s = sum(jnp.sum(jnp.where(jnp.isfinite(l), l, 0)) for l in leaves)
            if not leaves:
                s = jnp.asarray(0.0, x0.dtype)
            return jnp.asarray(s, x0.dtype).reshape(()) * 1e-30, ()

        c, _ = lax.scan(body, jnp.zeros((), x0.dtype), None, length=n_inner)
        return c

    jloop = jax.jit(loop)
    force(jloop(x))  # compile + warm + drain the queue
    rt = _roundtrip_s()
    t0 = time.perf_counter()
    out = None
    for _ in range(reps):
        out = jloop(x)  # enqueue; executions serialize on device
    force(out)  # one true barrier at the end
    elapsed = time.perf_counter() - t0
    # subtract the single final dispatch/transfer round trip, not per rep
    return max(elapsed - rt, 1e-9) / (reps * n_inner)
