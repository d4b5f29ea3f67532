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

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import klt_tpu as klt
from klt_tpu.config import TrackingConfig
from klt_tpu.ops.pyramid import build_image_pyramids
from klt_tpu.parallel.batched_lk import (track_features_pyramid_batched,
                                         _packed_stacks)


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
        # scans the same 9 PAIR steps as the other stages (one new
        # pyramid per step), so the us/step columns are comparable
        def body(i, acc):
            def scanbody(carry, t):
                p = vpyr(fb[:, t] + carry.astype(jnp.uint8))
                return jnp.uint8(0), p[0][-1][:, 0, 0]
            _, outs = jax.lax.scan(scanbody, jnp.uint8(0),
                                   jnp.arange(1, fb.shape[1]))
            return acc + outs.sum() + x[0, 0] * 0
        return jax.lax.fori_loop(0, reps, body, jnp.float32(0))

    @jax.jit
    def prog_full(fb, x, y, v):
        def body(i, acc):
            def scanbody(carry, t):
                sp1, xc, yc, vc = carry
                sp2 = _packed_stacks(fb[:, t], cfg)
                xn, yn, vn = track_features_pyramid_batched(
                    sp1, sp2, xc, yc, vc, cfg)
                return (sp2, xn, yn, vn), xn.sum()
            sp0 = _packed_stacks(fb[:, 0], cfg)
            (_, xf, _, _), _ = jax.lax.scan(
                scanbody, (sp0, x + 1e-4 * i.astype(jnp.float32), y, v),
                jnp.arange(1, fb.shape[1]))
            return acc + xf
        return jax.lax.fori_loop(0, reps, body, jnp.zeros_like(x))

    # the batched path's exact extraction calls (p1w ny=h+1 + p2
    # first-round ny=k per level, rows formulation at B*F scale), no
    # LK kernel: isolates extraction cost
    from klt_tpu.ops.interp import (pack_stack_channels, extract_flat,
                                    extract_flat_rows, _ROWS_MIN_F)
    from klt_tpu.ops.lk import _kernel_patch_size

    n_tot = b * nf
    exfn = extract_flat_rows if n_tot >= _ROWS_MIN_F else extract_flat
    exf = jax.vmap(exfn, in_axes=(0, 0, 0, None, None, None))
    w, h = cfg.window_width, cfg.window_height

    @jax.jit
    def prog_extract_only(fb, x, y, v):
        def body(i, acc):
            def scanbody(carry, t):
                p1, xc, yc, vc = carry
                p2 = vpyr(fb[:, t])
                tot = jnp.float32(0)
                for r in range(cfg.n_pyramid_levels - 1, -1, -1):
                    s1 = jnp.stack([p1[0][r], p1[1][r], p1[2][r]], axis=1)
                    s2 = jnp.stack([p2[0][r], p2[1][r], p2[2][r]], axis=1)
                    nr, nc = s2.shape[-2], s2.shape[-1]
                    k = _kernel_patch_size(nr, nc, cfg)
                    sp1 = jax.vmap(pack_stack_channels)(s1)
                    sp2 = jax.vmap(pack_stack_channels)(s2)
                    sc = np.float32(cfg.subsampling ** r)
                    py0 = jnp.clip((yc / sc).astype(jnp.int32) - h // 2,
                                   0, nr - (h + 1))
                    px0 = jnp.clip((xc / sc).astype(jnp.int32) - w // 2,
                                   0, nc - (w + 1))
                    p1w = exf(sp1, py0, px0, h + 1, w + 1, k)
                    qy0 = jnp.clip(py0 - 4, 0, nr - k)
                    qx0 = jnp.clip(px0 - 4, 0, nc - k)
                    p2w = exf(sp2, qy0, qx0, k, k, k)
                    tot = tot + (p1w * p1w).sum() + (p2w * p2w).sum()
                return (p2, xc + tot * 1e-30, yc, vc), tot
            p0 = vpyr(fb[:, 0])
            (_, xf, _, _), outs = jax.lax.scan(
                scanbody, (p0, x + 1e-4 * i.astype(jnp.float32), y, v),
                jnp.arange(1, fb.shape[1]))
            return acc + outs.sum() + xf.sum() * 0
        return jax.lax.fori_loop(0, reps, body, jnp.float32(0))

    import dataclasses

    def make_full(cfg_v):
        @jax.jit
        def prog(fb, x, y, v):
            def body(i, acc):
                def scanbody(carry, t):
                    sp1, xc, yc, vc = carry
                    sp2 = _packed_stacks(fb[:, t], cfg_v)
                    xn, yn, vn = track_features_pyramid_batched(
                        sp1, sp2, xc, yc, vc, cfg_v)
                    return (sp2, xn, yn, vn), xn.sum()
                sp0 = _packed_stacks(fb[:, 0], cfg_v)
                (_, xf, _, _), _ = jax.lax.scan(
                    scanbody, (sp0, x + 1e-4 * i.astype(jnp.float32), y, v),
                    jnp.arange(1, fb.shape[1]))
                return acc + xf
            return jax.lax.fori_loop(0, reps, body, jnp.zeros_like(x))
        return prog

    t_pyr = timed(prog_pyr_only, fb, x0) / (reps * n_pairs)
    print(f"B={b} F={nf}")
    print(f"batched pyramids only    : {t_pyr*1e6:9.1f} us/step "
          f"({t_pyr*1e6/b:7.1f} us/seq-frame)")
    t_ex = timed(prog_extract_only, fb, x0, y0, v0) / (reps * n_pairs)
    print(f"pyr + extract rounds     : {t_ex*1e6:9.1f} us/step")
    t_all = timed(prog_full, fb, x0, y0, v0) / (reps * n_pairs)
    print(f"full batched step        : {t_all*1e6:9.1f} us/step "
          f"-> aggregate {b/t_all:8.1f} fps")
    cfg1 = dataclasses.replace(cfg, max_iterations=1)
    t_it1 = timed(make_full(cfg1), fb, x0, y0, v0) / (reps * n_pairs)
    print(f"full step @max_iter=1    : {t_it1*1e6:9.1f} us/step "
          f"(iteration cost ~ {(t_all-t_it1)*1e6:7.1f} us)")

    # the REAL sequences entry point (includes the level-0 canvas
    # carry when eligible) — this is what bench.py measures
    from klt_tpu.parallel.batched_lk import track_sequences_batched

    @jax.jit
    def prog_seq(fb, x, y, v):
        def body(i, acc):
            xs, ys, vs = track_sequences_batched(
                fb, x + 1e-4 * i.astype(jnp.float32), y, v, cfg)
            return acc + xs[-1]
        return jax.lax.fori_loop(0, reps, body, jnp.zeros_like(x))

    t_seq = timed(prog_seq, fb, x0, y0, v0) / (reps * n_pairs)
    print(f"track_sequences_batched  : {t_seq*1e6:9.1f} us/step "
          f"-> aggregate {b/t_seq:8.1f} fps")
    print(f"device: {jax.devices()[0]}")


if __name__ == "__main__":
    main()
