"""Pallas TPU kernels for the hot ops (the V3-CUDA role, re-thought).

Each kernel has a pure-jnp oracle in klt_tpu/ops; the dispatchers there
pick the Pallas path on TPU when shapes fit in VMEM and fall back to the
XLA path otherwise (and under `KLT_TPU_NO_PALLAS=1`).
"""

import os


def pallas_enabled() -> bool:
    """True when Pallas kernels should be used on the current backend."""
    if os.environ.get("KLT_TPU_NO_PALLAS", "0") == "1":
        return False
    if interpret_mode():
        return True
    import jax
    try:
        return jax.default_backend() in ("tpu", "axon")
    except RuntimeError:
        return False


def interpret_mode() -> bool:
    """Run kernels in Pallas interpret mode (CPU testing of kernel
    logic; set KLT_TPU_PALLAS_INTERPRET=1)."""
    return os.environ.get("KLT_TPU_PALLAS_INTERPRET", "0") == "1"


def pallas_key():
    """The (pallas_enabled, interpret_mode) decision pair, threaded
    through every jit entry point as a static arg so toggling
    KLT_TPU_NO_PALLAS / KLT_TPU_PALLAS_INTERPRET between same-shape
    calls RETRACES instead of silently reusing the stale compiled
    program."""
    return (pallas_enabled(), interpret_mode())
