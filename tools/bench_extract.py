"""A/B correctness + throughput for patch-extraction formulations.

Measures on whatever backend is active (run WITHOUT JAX_PLATFORMS=cpu
for the real chip).  Timing uses a scanned chain with per-step index
variation so XLA can neither hoist nor DCE the extraction
(micro-benchmark pitfall notes: see klt_tpu/utils/profiling.py).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np
import jax
import jax.numpy as jnp

from klt_tpu.ops.interp import (onehot_extract_packed,
                                onehot_extract_packed_rows)


def timed(fn, stack, y0s, x0s, reps):
    """y0s, x0s: [reps, F] per-step corners; returns seconds/step."""

    @jax.jit
    def run(stack, y0s, x0s):
        def body(acc, yx):
            out = fn(stack, yx[0], yx[1])
            return acc + jnp.sum(out), None

        acc, _ = jax.lax.scan(body, jnp.float32(0.0),
                              (y0s, x0s))
        return acc

    r = run(stack, y0s, x0s)
    r.block_until_ready()
    t0 = time.perf_counter()
    r = run(stack, y0s, x0s)
    r.block_until_ready()
    dt = time.perf_counter() - t0
    return dt / reps, float(r)


def main():
    print("backend:", jax.devices())
    rng = np.random.default_rng(0)
    k = 16
    reps = 50
    for (h, w, f) in [(240, 320, 150), (480, 640, 150), (480, 640, 512),
                      (480, 640, 2048), (480, 640, 4096)]:
        stack = jnp.asarray(
            rng.standard_normal((3, h, w)).astype(np.float32))
        y0 = rng.integers(0, h - k, size=(reps, f)).astype(np.int32)
        x0 = rng.integers(0, w - k, size=(reps, f)).astype(np.int32)
        y0j, x0j = jnp.asarray(y0), jnp.asarray(x0)

        # exactness A/B on one step
        a = onehot_extract_packed(stack, y0j[0], x0j[0], k, k)
        bref = onehot_extract_packed_rows(stack, y0j[0], x0j[0], k, k)
        err = float(jnp.max(jnp.abs(a - bref)))
        scale = float(jnp.max(jnp.abs(bref)))

        t_new, _ = timed(
            lambda s, yy, xx: onehot_extract_packed(s, yy, xx, k, k),
            stack, y0j, x0j, reps)
        t_old, _ = timed(
            lambda s, yy, xx: onehot_extract_packed_rows(s, yy, xx, k, k),
            stack, y0j, x0j, reps)
        print(f"H{h}xW{w} F={f}: rows {1e6 * t_old:8.1f} us  "
              f"blocked {1e6 * t_new:8.1f} us  "
              f"speedup {t_old / t_new:5.2f}x  maxerr {err:.2e} "
              f"(scale {scale:.1f})")


if __name__ == "__main__":
    main()
