"""Test configuration: run everything on a virtual 8-device CPU mesh with
float64 enabled (the reference is all-double; parity tests need f64; the
sharding tests need multiple devices).

NOTE: the ambient environment registers a remote-TPU ("axon") backend via a
sitecustomize hook *before* pytest starts, and pins ``jax_platforms`` to it.
Plain env vars set here are therefore too late — we must override through
``jax.config`` after import, which is still before any backend is
initialized.
"""

import os

# Pallas kernels run in interpret mode (plain XLA) on CPU so the suite can
# cover the kernel body + jit-level prep; must be set before the module
# reads it at import time. Pipeline dispatch still takes the XLA path on
# CPU (``pallas_supported()`` is False) — only direct kernel tests use this.
os.environ.setdefault("LOAM_PALLAS_INTERPRET", "1")

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
