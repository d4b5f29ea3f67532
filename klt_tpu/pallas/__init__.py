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


# every env knob the tracking path reads at TRACE time; part of the
# jit cache key (pallas_key) so toggling any of them between
# same-shape calls retraces instead of silently reusing the stale
# compiled program
_TRACE_KNOBS = (
    ("KLT_TPU_LK_V1", "0"),
    ("KLT_TPU_EXTRACT", "onehot"),
    ("KLT_TPU_MERGED_EXTRACT", "0"),
    ("KLT_TPU_COND_REANCHOR", "0"),
    ("KLT_TPU_STALL_COMPACT", "1"),
    ("KLT_TPU_STALL_COMPACT_MIN", ""),
    ("KLT_TPU_ITER_CAP", "0"),
    ("KLT_TPU_CARRY_REFRESH", "1"),
    ("KLT_TPU_P2_ROWS", "0"),
    ("KLT_TPU_EXTRACT_PREC", "high"),
    ("KLT_TPU_SCAN_UNROLL", "1"),
    ("KLT_TPU_AFFINE_REPAIR_P", ""),
    ("KLT_TPU_AFFINE_REPAIR_M", ""),
    ("KLT_TPU_AFFINE_LADDER", ""),
    ("KLT_TPU_AFFINE_DEBUG_COUNTS", "0"),
)


def pallas_key():
    """Fingerprint of every trace-time kernel-path decision — the
    Pallas on/off + interpret pair plus the _TRACE_KNOBS env values —
    threaded through every jit entry point as a static arg."""
    return (pallas_enabled(), interpret_mode(),
            tuple(os.environ.get(k, d) for k, d in _TRACE_KNOBS))
