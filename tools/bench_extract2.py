"""A/B throughput for extract_flat formulations at batched feature
counts (the 100x-throughput path's dominant cost, round-3 trace:
band einsum 605us + col einsum 708us + realign 1602us per batched step
at B*F=2400).

Run on the real chip: python tools/bench_extract2.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np
import jax
import jax.numpy as jnp

from klt_tpu.ops.interp import (extract_flat_blocked, extract_flat_rows,
                                extract_flat_rows_cb, extract_flat_tiled)


def extract_flat_ds(stack_packed, y0, x0, ny, nx, k, c=3):
    """Block-gather formulation: per-feature dynamic_slice of the
    (ny, nx) block per channel, relaid out to the flattened canvas.
    XLA lowers the vmapped slice to one gather HLO."""
    h, cw = stack_packed.shape
    w = cw // c
    st = stack_packed.reshape(h, c, w).transpose(1, 0, 2)  # [C, H, W]

    def one(ys, xs):
        return jax.lax.dynamic_slice(st, (0, ys, xs), (c, ny, nx))

    p = jax.vmap(one)(y0, x0)                    # [F, C, ny, nx]
    p = p.transpose(0, 2, 1, 3)                  # [F, ny, C, nx]
    f = y0.shape[0]
    if nx < k:
        p = jnp.pad(p, ((0, 0), (0, 0), (0, 0), (0, k - nx)))
    out = p.reshape(f, ny, c * k)
    if ny < k:
        out = jnp.pad(out, ((0, 0), (0, k - ny), (0, 0)))
    return out.reshape(f, c * k * k)


def timed(fn, stack, y0s, x0s, reps):
    @jax.jit
    def run(stack, y0s, x0s):
        def body(acc, yx):
            out = fn(stack, yx[0], yx[1])
            return acc + jnp.sum(out * out), None
        acc, _ = jax.lax.scan(body, jnp.float32(0.0), (y0s, x0s))
        return acc

    r = run(stack, y0s, x0s)
    r.block_until_ready()
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        r = run(stack, y0s, x0s)
        r.block_until_ready()
        best = min(best, time.perf_counter() - t0)
    return best / reps, float(r)


def main():
    print("backend:", jax.devices())
    rng = np.random.default_rng(0)
    k = 16
    reps = 30
    for (h, w, f, ny) in [(240, 320, 150, 16), (240, 320, 2400, 16),
                          (240, 320, 2400, 8), (480, 640, 2048, 16),
                          (480, 640, 4096, 16), (480, 640, 12288, 16)]:
        stack = jnp.asarray(
            rng.standard_normal((h, 3 * w)).astype(np.float32))
        y0 = rng.integers(0, h - k, size=(reps, f)).astype(np.int32)
        x0 = rng.integers(0, w - k, size=(reps, f)).astype(np.int32)
        y0j, x0j = jnp.asarray(y0), jnp.asarray(x0)

        a = extract_flat_blocked(stack, y0j[0], x0j[0], ny, k, k)
        b = extract_flat_rows(stack, y0j[0], x0j[0], ny, k, k)
        err = float(jnp.max(jnp.abs(a - b)))

        cth = extract_flat_rows_cb(stack, y0j[0], x0j[0], ny, k, k)
        err_cb = float(jnp.max(jnp.abs(a - cth)))

        t_blk, _ = timed(
            lambda s, yy, xx: extract_flat_blocked(s, yy, xx, ny, k, k),
            stack, y0j, x0j, reps)
        t_row, _ = timed(
            lambda s, yy, xx: extract_flat_rows(s, yy, xx, ny, k, k),
            stack, y0j, x0j, reps)
        t_cb, _ = timed(
            lambda s, yy, xx: extract_flat_rows_cb(s, yy, xx, ny, k, k),
            stack, y0j, x0j, reps)
        d = extract_flat_ds(stack, y0j[0], x0j[0], ny, k, k)
        err_ds = float(jnp.max(jnp.abs(a - d)))
        t_ds, _ = timed(
            lambda s, yy, xx: extract_flat_ds(s, yy, xx, ny, k, k),
            stack, y0j, x0j, reps)
        tl = extract_flat_tiled(stack, y0j[0], x0j[0], ny, k, k)
        err_tl = float(jnp.max(jnp.abs(a - tl)))
        t_tl, _ = timed(
            lambda s, yy, xx: extract_flat_tiled(s, yy, xx, ny, k, k),
            stack, y0j, x0j, reps)
        print(f"H{h}xW{w} F={f} ny={ny}: blocked {1e6*t_blk:8.1f} us  "
              f"rows {1e6*t_row:8.1f} us  cb {1e6*t_cb:8.1f} us  "
              f"ds {1e6*t_ds:8.1f} us  tiled {1e6*t_tl:8.1f} us  "
              f"maxerr {err:.2e}/{err_cb:.2e}/{err_ds:.2e}/{err_tl:.2e}")


if __name__ == "__main__":
    main()
