"""Micro-benchmarks for the affine-consistency stage's components on
the real chip — drives the round-3 optimization of BASELINE config 3.

Parts measured (all at N features, default 2000, chained + repped so
nothing is DCE'd and dispatch amortizes):
  resident_cb     extract_packed_cb of [N, 48, 144] resident patches
  resident_ds     vmapped dynamic_slice + pack of the same patches
  iter_full       one mode-2 GN iteration's sampling einsums (P=48)
  iter_tight      same samples via a re-centered 24-wide tight patch
  step_compact    full _affine_step_jit (compaction ON)
  step_full       full _affine_step_jit (compaction OFF)

Run: python tools/bench_affine_parts.py [N]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

import klt_tpu as klt
from klt_tpu.ops.interp import pack_stack_channels, extract_packed_cb
from klt_tpu.ops.affine import (_sample_in_patch3, _bilinear_weights,
                                _RESIDENT)

DATA = "/root/reference/data/images_laptops"


def timed(fn, *args, reps=20, inner=1):
    r = fn(*args)
    jax.block_until_ready(r)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(reps):
            r = fn(*args)
        jax.block_until_ready(r)
        best = min(best, (time.perf_counter() - t0) / (reps * inner))
    return best


def main():
    klt.set_verbosity(0)
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    img = klt.read_pgm(os.path.join(DATA, "img1.pgm")).astype(np.float32)
    h, w = img.shape
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.uniform(40, w - 40, n).astype(np.float32))
    y = jnp.asarray(rng.uniform(40, h - 40, n).astype(np.float32))
    stack = jnp.stack([jnp.asarray(img)] * 3)
    sp = pack_stack_channels(stack)
    pres = _RESIDENT

    x0 = jnp.clip(x.astype(jnp.int32) - pres // 2, 0, w - pres)
    y0 = jnp.clip(y.astype(jnp.int32) - pres // 2, 0, h - pres)

    @jax.jit
    def resident_cb(sp, y0, x0):
        return extract_packed_cb(sp, y0, x0, pres, pres)

    @jax.jit
    def resident_ds(stack, y0, x0):
        def one(ys, xs):
            return jax.lax.dynamic_slice(stack, (0, ys, xs),
                                         (3, pres, pres))
        p = jax.vmap(one)(y0, x0)         # [N, 3, P, P]
        return p.transpose(0, 2, 1, 3).reshape(n, pres, 3 * pres)

    t_cb = timed(resident_cb, sp, y0, x0)
    r1 = resident_cb(sp, y0, x0)
    r2 = resident_ds(stack, y0, x0)
    eq = bool(jnp.all(r1 == r2))
    t_ds = timed(resident_ds, stack, y0, x0)
    print(f"resident_cb  {t_cb * 1e6:8.0f} us   (bit-eq ds: {eq})",
          flush=True)
    print(f"resident_ds  {t_ds * 1e6:8.0f} us", flush=True)

    resid = r1
    # warp coords for a 15x15 window, mild affine
    K = 225
    dy_, dx_ = np.mgrid[-7:8, -7:8]
    dxo = jnp.asarray(dx_.ravel().astype(np.float32))
    dyo = jnp.asarray(dy_.ravel().astype(np.float32))
    axx = 1.0 + jnp.asarray(rng.uniform(-0.05, 0.05, n).astype(np.float32))
    axy = jnp.asarray(rng.uniform(-0.05, 0.05, n).astype(np.float32))
    pax0f = x0.astype(jnp.float32)[:, None]
    pay0f = y0.astype(jnp.float32)[:, None]

    def warp(xc, yc):
        u = xc[:, None] + axx[:, None] * dxo[None, :] + \
            axy[:, None] * dyo[None, :]
        v = yc[:, None] + axy[:, None] * dxo[None, :] + \
            axx[:, None] * dyo[None, :]
        return u, v

    @jax.jit
    def iter_full(resid, xc, yc, it=8):
        def body(c, _):
            u, v = warp(xc + c * 1e-3, yc)
            g2, gx, gy = _sample_in_patch3(resid, u - pax0f,
                                           v - pay0f, pres)
            c = c + g2.sum() * 1e-20 + gx.sum() * 1e-20 + \
                gy.sum() * 1e-20
            return c, ()
        c, _ = jax.lax.scan(body, jnp.float32(0.0), length=it)
        return c

    TP = 24

    @jax.jit
    def iter_tight(resid, xc, yc, it=8):
        def body(c, _):
            xcc = xc + c * 1e-3
            # integer re-center inside the resident patch
            rx = jnp.clip(xcc.astype(jnp.int32) - x0 - TP // 2, 0,
                          pres - TP)
            ry = jnp.clip(yc.astype(jnp.int32) - y0 - TP // 2, 0,
                          pres - TP)
            ri = jnp.arange(pres, dtype=jnp.int32)
            roh = ((ry[:, None, None] +
                    jnp.arange(TP, dtype=jnp.int32)[None, :, None]) ==
                   ri[None, None, :]).astype(jnp.float32)
            band = jnp.einsum("nrp,npj->nrj", roh, resid,
                              precision=jax.lax.Precision.HIGH,
                              preferred_element_type=jnp.float32)
            j = jnp.arange(3 * TP, dtype=jnp.int32)
            tgt = (j // TP) * pres + (j % TP)
            wp = jnp.arange(3 * pres, dtype=jnp.int32)
            coh = ((rx[:, None, None] + tgt[None, None, :]) ==
                   wp[None, :, None]).astype(jnp.float32)
            tight = jnp.einsum("nrj,njc->nrc", band, coh,
                               precision=jax.lax.Precision.HIGH,
                               preferred_element_type=jnp.float32)
            u, v = warp(xcc, yc)
            g2, gx, gy = _sample_in_patch3(
                tight, u - pax0f - rx.astype(jnp.float32)[:, None],
                v - pay0f - ry.astype(jnp.float32)[:, None], TP)
            c = c + g2.sum() * 1e-20 + gx.sum() * 1e-20 + \
                gy.sum() * 1e-20
            return c, ()
        c, _ = jax.lax.scan(body, jnp.float32(0.0), length=it)
        return c

    # bit-equality of the two sampling routes (weights/data identical
    # when the warp window fits the tight patch)
    @jax.jit
    def samples_full():
        u, v = warp(x, y)
        return _sample_in_patch3(resid, u - pax0f, v - pay0f, pres)

    @jax.jit
    def samples_tight():
        rx = jnp.clip(x.astype(jnp.int32) - x0 - TP // 2, 0, pres - TP)
        ry = jnp.clip(y.astype(jnp.int32) - y0 - TP // 2, 0, pres - TP)
        ri = jnp.arange(pres, dtype=jnp.int32)
        roh = ((ry[:, None, None] +
                jnp.arange(TP, dtype=jnp.int32)[None, :, None]) ==
               ri[None, None, :]).astype(jnp.float32)
        band = jnp.einsum("nrp,npj->nrj", roh, resid,
                          precision=jax.lax.Precision.HIGH,
                          preferred_element_type=jnp.float32)
        j = jnp.arange(3 * TP, dtype=jnp.int32)
        tgt = (j // TP) * pres + (j % TP)
        wp = jnp.arange(3 * pres, dtype=jnp.int32)
        coh = ((rx[:, None, None] + tgt[None, None, :]) ==
               wp[None, :, None]).astype(jnp.float32)
        tight = jnp.einsum("nrj,njc->nrc", band, coh,
                           precision=jax.lax.Precision.HIGH,
                           preferred_element_type=jnp.float32)
        u, v = warp(x, y)
        return _sample_in_patch3(
            tight, u - pax0f - rx.astype(jnp.float32)[:, None],
            v - pay0f - ry.astype(jnp.float32)[:, None], TP)

    sf = samples_full()
    st = samples_tight()
    eqs = [bool(jnp.all(a == b)) for a, b in zip(sf, st)]
    print(f"tight-vs-full bit-eq: {eqs}", flush=True)

    t_if = timed(iter_full, resid, x, y, inner=8)
    t_it = timed(iter_tight, resid, x, y, inner=8)
    print(f"iter_full    {t_if * 1e6:8.0f} us/iter", flush=True)
    print(f"iter_tight   {t_it * 1e6:8.0f} us/iter", flush=True)


if __name__ == "__main__":
    main()
