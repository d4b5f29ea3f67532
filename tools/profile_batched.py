"""Breakdown of the BATCHED multi-sequence step (the 100x-throughput
path): where does the per-step time go at B sequences x F features?

Stage ablations, each a whole-sequence device program (reps folded into
a fori_loop so dispatch amortizes, chained data dependencies so nothing
is DCE'd):
  A. batched pyramid build only
  B. pyramids + ONE extraction round per level (no Newton rounds)
  C. pyramids + batched LK per level (full rounds)   == bench program

Run on the real TPU:  python tools/profile_batched.py [B] [F]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import jax
import jax.numpy as jnp

import klt_tpu as klt
from klt_tpu.config import TrackingConfig
from klt_tpu.ops.pyramid import build_image_pyramids
from klt_tpu.parallel.batched_lk import track_features_pyramid_batched


def timed(fn, *args, reps=3):
    r = fn(*args)
    jax.block_until_ready(r)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        r = fn(*args)
        jax.block_until_ready(r)
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    klt.set_verbosity(0)
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    nf = int(sys.argv[2]) if len(sys.argv) > 2 else 150
    cfg = TrackingConfig(sequential_mode=True)
    data = "/root/reference/data/images_provided"
    frames = np.stack([klt.read_pgm(os.path.join(data, f"img{i}.pgm"))
                       for i in range(10)])
    tracker = klt.KLTracker(cfg)
    fl = klt.FeatureList.create(nf)
    tracker.select_good_features(frames[0], fl)
    n_pairs = frames.shape[0] - 1

    fb = jax.device_put(np.broadcast_to(frames, (b,) + frames.shape).copy())
    x0 = jax.device_put(np.broadcast_to(fl.x, (b, nf)).copy())
    y0 = jax.device_put(np.broadcast_to(fl.y, (b, nf)).copy())
    v0 = jax.device_put(np.broadcast_to(fl.val, (b, nf)).copy())
    reps = 10

    def vpyr(imgs):
        p, gx, gy = jax.vmap(lambda im: build_image_pyramids(im, cfg))(imgs)
        return tuple(p), tuple(gx), tuple(gy)

    @jax.jit
    def prog_pyr_only(fb, x):
        def body(i, acc):
            def scanbody(carry, t):
                p = vpyr(fb[:, t] + carry.astype(jnp.uint8))
                return jnp.uint8(0), p[0][-1][:, 0, 0]
            _, outs = jax.lax.scan(scanbody, jnp.uint8(0),
                                   jnp.arange(fb.shape[1]))
            return acc + outs.sum() + x[0, 0] * 0
        return jax.lax.fori_loop(0, reps, body, jnp.float32(0))

    @jax.jit
    def prog_full(fb, x, y, v):
        def body(i, acc):
            def scanbody(carry, t):
                p1, xc, yc, vc = carry
                p2 = vpyr(fb[:, t])
                xn, yn, vn = track_features_pyramid_batched(
                    p1[0], p1[1], p1[2], p2[0], p2[1], p2[2],
                    xc, yc, vc, cfg)
                return (p2, xn, yn, vn), xn.sum()
            p0 = vpyr(fb[:, 0])
            (_, xf, _, _), _ = jax.lax.scan(
                scanbody, (p0, x + 1e-4 * i.astype(jnp.float32), y, v),
                jnp.arange(1, fb.shape[1]))
            return acc + xf
        return jax.lax.fori_loop(0, reps, body, jnp.zeros_like(x))

    # one extraction round per level, no kernel: isolates the one-hot
    # extraction matmul cost at [B*F] scale
    from klt_tpu.ops.interp import pack_stack_channels, extract_flat
    from klt_tpu.ops.lk import _kernel_patch_size

    @jax.jit
    def prog_extract_only(fb, x, y, v):
        def body(i, acc):
            def scanbody(carry, t):
                p1, xc, yc, vc = carry
                p2 = vpyr(fb[:, t])
                tot = jnp.float32(0)
                for r in range(cfg.n_pyramid_levels - 1, -1, -1):
                    s2 = jnp.stack([p2[0][r], p2[1][r], p2[2][r]], axis=1)
                    nr, nc = s2.shape[-2], s2.shape[-1]
                    k = _kernel_patch_size(nr, nc, cfg)
                    sp2 = jax.vmap(pack_stack_channels)(s2)
                    sc = np.float32(cfg.subsampling ** r)
                    py0 = jnp.clip((yc / sc).astype(jnp.int32) - 8, 0,
                                   nr - k)
                    px0 = jnp.clip((xc / sc).astype(jnp.int32) - 8, 0,
                                   nc - k)
                    exf = jax.vmap(extract_flat,
                                   in_axes=(0, 0, 0, None, None, None))
                    p2w = exf(sp2, py0, px0, k, k, k)
                    tot = tot + (p2w * p2w).sum()
                return (p2, xc + tot * 1e-30, yc, vc), tot
            p0 = vpyr(fb[:, 0])
            (_, xf, _, _), outs = jax.lax.scan(
                scanbody, (p0, x + 1e-4 * i.astype(jnp.float32), y, v),
                jnp.arange(1, fb.shape[1]))
            return acc + outs.sum() + xf.sum() * 0
        return jax.lax.fori_loop(0, reps, body, jnp.float32(0))

    t_pyr = timed(prog_pyr_only, fb, x0) / (reps * 10)
    print(f"B={b} F={nf}")
    print(f"batched pyramids only    : {t_pyr*1e6:9.1f} us/step "
          f"({t_pyr*1e6/b:7.1f} us/seq-frame)")
    t_ex = timed(prog_extract_only, fb, x0, y0, v0) / (reps * n_pairs)
    print(f"pyr + 1 extract round/lvl: {t_ex*1e6:9.1f} us/step")
    t_all = timed(prog_full, fb, x0, y0, v0) / (reps * n_pairs)
    print(f"full batched step        : {t_all*1e6:9.1f} us/step "
          f"-> aggregate {b/t_all:8.1f} fps")
    print(f"device: {jax.devices()[0]}")


if __name__ == "__main__":
    main()
