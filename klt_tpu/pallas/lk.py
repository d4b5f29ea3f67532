"""Batched Lucas-Kanade Newton loop as one Pallas TPU kernel per level.

The TPU analogue of the reference's V3 per-feature device tracker
(trackFeaturesKernel, src/V3/trackFeaturesGPU.cu:191-281), re-thought for
vector lanes instead of CUDA blocks: all F features advance together,
one kernel invocation runs the ENTIRE masked Newton iteration loop of
one pyramid level in VMEM.  This removes the dominant costs of the XLA
formulation — per-iteration HLO op overhead and batched tiny einsums —
measured at ~34 us/iteration on a v5e; the in-kernel iteration is a few
microseconds.

Data layout (chosen for the Mosaic constraints of this toolchain: no
gathers, no dynamic lane indexing, no dynamic-shift rolls, no bool loop
carries, no multi-axis reductions, no rank-1 vectors):
* per-feature patches `[F, K, 3*K]` f32 — K x K-pixel patches with the
  3 channels (intensity, gradx, grady) as contiguous K-lane blocks;
  extracted once per anchor round by the XLA-side one-hot matmuls
  (ops/interp.onehot_extract) and re-anchored only when a feature's
  Newton trajectory leaves its patch margin;
* window sampling inside the kernel is a static unroll over the
  possible integer offsets: masked adds over row slices, then masked
  adds over static lane rolls (circular wrap only touches lanes beyond
  each channel's window, which are never read);
* per-feature scalars travel packed: one `[F, 8]` f32 and one `[F, 4]`
  i32 operand, cutting custom-call staging from 12 operands to 4.

Semantics are identical to ops/lk.py's patch-resident fast path (which
is itself validated against the C reference's _trackFeature,
src/V1/trackFeatures.c:381-486): same status codes, same check order,
same stall-and-reanchor behavior, f32 arithmetic throughout.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import TrackingConfig, TRACKED, SMALL_DET, OOB

_EPS = np.float32(1.001)  # reference: src/V1/trackFeatures.c:409

# packed f32 state columns
FX2, FY2, FAX1, FAY1, FA2X, FA2Y = range(6)
# packed i32 state columns
ISTATUS, IITERS, IDONE, IOOB1 = range(4)


def _wsum(x):
    """Window reduction [F, h, w] -> [F, 1] f32 (two single-axis sums —
    this Mosaic crashes on multi-axis reductions and rank-1 vectors)."""
    s2 = jnp.sum(x, axis=2, keepdims=True)
    return jnp.sum(s2[:, :, 0], axis=1, keepdims=True)


def _make_kernel(cfg: TrackingConfig, k: int, nc: int, nr: int, f: int,
                 want_residue: bool = True):
    w, h = cfg.window_width, cfg.window_height
    hw, hh = np.float32(w // 2), np.float32(h // 2)
    hwi, hhi = w // 2, h // 2
    ncf, nrf = np.float32(nc), np.float32(nr)
    th = np.float32(cfg.min_displacement)
    area = np.float32(w * h)
    step = np.float32(cfg.step_factor)
    min_det = np.float32(cfg.min_determinant)
    max_iter = cfg.max_iterations
    lighting = cfg.lighting_insensitive
    n_off_x = k - (w + 1) + 1  # valid in-patch column offsets
    n_off_y = k - (h + 1) + 1  # valid in-patch row offsets

    def window_oob(x, y):
        return ((x - hw < 0.0) | (ncf - (x + hw) < _EPS) |
                (y - hh < 0.0) | (nrf - (y + hh) < _EPS))

    def chan(win, c, dr, dc):
        """[F, h, w] window slice of channel c at bilinear shift (dr, dc)
        from a [F, h+1, 3*(w+1)] (or wider) raw window."""
        return win[:, dr:dr + h, c * k + dc:c * k + dc + w]

    def chan_small(win, c, dr, dc):
        """Same, but from the compact [F, h+1, 3*(w+1)] first-image
        window whose channel blocks are (w+1) wide."""
        return win[:, dr:dr + h, c * (w + 1) + dc:c * (w + 1) + dc + w]

    def blend(win, ax, ay, cget):
        """Bilinear blend -> (g, gx, gy) each [F, h, w]."""
        ax3 = ax[:, :, None]
        ay3 = ay[:, :, None]
        outs = []
        for c in range(3):
            outs.append((1 - ax3) * (1 - ay3) * cget(win, c, 0, 0) +
                        ax3 * (1 - ay3) * cget(win, c, 0, 1) +
                        (1 - ax3) * ay3 * cget(win, c, 1, 0) +
                        ax3 * ay3 * cget(win, c, 1, 1))
        return outs

    def gain_bias_diff(g1, g2):
        mean1 = _wsum(g1 * g1) / area
        mean2 = _wsum(g2 * g2) / area
        alpha = jnp.sqrt(mean1 / mean2)
        m1 = _wsum(g1) / area
        m2 = _wsum(g2) / area
        beta = m1 - alpha * m2
        return g1 - g2 * alpha[:, :, None] - beta[:, :, None]

    def kernel(p1w_ref, p2_ref, fs_ref, is_ref, fso, iso, reso):
        p2 = p2_ref[:]
        fs = fs_ref[:]
        a2x = fs[:, FA2X:FA2X + 1]
        a2y = fs[:, FA2Y:FA2Y + 1]
        a2xi = a2x.astype(jnp.int32)
        a2yi = a2y.astype(jnp.int32)
        oob1 = is_ref[:, IOOB1:IOOB1 + 1] != 0

        g1, gx1w, gy1w = blend(p1w_ref[:], fs[:, FAX1:FAX1 + 1],
                               fs[:, FAY1:FAY1 + 1], chan_small)

        def sample(x2c, y2c):
            xt = x2c.astype(jnp.int32)
            yt = y2c.astype(jnp.int32)
            ax = x2c - xt.astype(jnp.float32)
            ay = y2c - yt.astype(jnp.float32)
            ox = xt - hwi - a2xi
            oy = yt - hhi - a2yi
            ovf = ((ox < 0) | (ox > n_off_x - 1) |
                   (oy < 0) | (oy > n_off_y - 1))
            ox3 = jnp.clip(ox, 0, n_off_x - 1)[:, :, None]
            oy3 = jnp.clip(oy, 0, n_off_y - 1)[:, :, None]

            rows = jnp.zeros((f, h + 1, 3 * k), jnp.float32)
            for s in range(n_off_y):
                m = (oy3 == s).astype(jnp.float32)
                rows = rows + m * p2[:, s:s + h + 1, :]
            # column select: static lane rolls; circular wrap only
            # reaches lanes >= 3K - n_off_x, which blend never reads
            win = jnp.zeros((f, h + 1, 3 * k), jnp.float32)
            for t in range(n_off_x):
                m = (ox3 == t).astype(jnp.float32)
                sl = rows if t == 0 else pltpu.roll(rows, 3 * k - t, 2)
                win = win + m * sl
            g2, gx2w, gy2w = blend(win, ax, ay, chan)
            return g2, gx2w, gy2w, ovf

        def newton(g2, gx2w, gy2w):
            if lighting:
                diff = gain_bias_diff(g1, g2)
                alpha = jnp.sqrt((_wsum(g1) / area) /
                                 (_wsum(g2) / area))[:, :, None]
                gradx = gx1w + gx2w * alpha
                grady = gy1w + gy2w * alpha
            else:
                diff = g1 - g2
                gradx = gx1w + gx2w
                grady = gy1w + gy2w
            gxx = _wsum(gradx * gradx)
            gxy = _wsum(gradx * grady)
            gyy = _wsum(grady * grady)
            ex = _wsum(diff * gradx) * step
            ey = _wsum(diff * grady) * step
            det = gxx * gyy - gxy * gxy
            small = det < min_det
            det_safe = jnp.where(small, jnp.float32(1.0), det)
            dx = (gyy * ex - gxy * ey) / det_safe
            dy = (gxx * ey - gxy * ex) / det_safe
            return dx, dy, small

        def body(state):
            x2c, y2c, status, iters, done_i, _ = state
            done = done_i != 0
            oob = oob1 | window_oob(x2c, y2c)
            status = jnp.where(~done & oob, OOB, status)
            done = done | oob

            g2, gx2w, gy2w, ovf = sample(x2c, y2c)
            stall = ~done & ovf
            eff = ~done & ~ovf

            dx, dy, small = newton(g2, gx2w, gy2w)
            status = jnp.where(eff & small, SMALL_DET, status)
            done = done | (eff & small)

            upd = eff & ~small
            x2c = x2c + jnp.where(upd, dx, 0.0)
            y2c = y2c + jnp.where(upd, dy, 0.0)
            iters = iters + upd.astype(jnp.int32)
            conv = (jnp.abs(dx) < th) & (jnp.abs(dy) < th)
            done = done | (upd & (conv | (iters >= max_iter)))
            return (x2c, y2c, status, iters, done.astype(jnp.int32),
                    jnp.any(stall).astype(jnp.int32))

        def going(state):
            done_i, stalled = state[4], state[5]
            return jnp.any(done_i == 0) & (stalled == 0)

        x2f, y2f, status, iters, done_i, _ = jax.lax.while_loop(
            going, body,
            (fs[:, FX2:FX2 + 1], fs[:, FY2:FY2 + 1],
             is_ref[:, ISTATUS:ISTATUS + 1], is_ref[:, IITERS:IITERS + 1],
             is_ref[:, IDONE:IDONE + 1], jnp.int32(0)))

        if want_residue:
            # residue at final position from the (clamped) patch —
            # consumed only for TRACKED lanes, whose last step was
            # < min_displacement
            g2, _, _, _ = sample(x2f, y2f)
            if lighting:
                diff = gain_bias_diff(g1, g2)
            else:
                diff = g1 - g2
            res = _wsum(jnp.abs(diff)) / area
        else:
            # coarser levels: LARGE_RESIDUE is overwritten by the next
            # level (only SMALL_DET/OOB break the reference level loop)
            res = jnp.zeros_like(x2f)

        fso[:] = jnp.concatenate([x2f, y2f], axis=1)
        iso[:] = jnp.concatenate(
            [status, iters, done_i, (done_i == 0).astype(jnp.int32)],
            axis=1)
        reso[:] = res

    return kernel


# feature-block size for the grid: single-sequence calls (F <= this)
# run as one block; large batched calls pipeline blocks through VMEM
FEATURE_BLOCK = 512


@functools.lru_cache(maxsize=64)
def _inner_call(cfg: TrackingConfig, k: int, nc: int, nr: int, f: int,
                fb: int, want_residue: bool = True):
    from . import interpret_mode
    w, h = cfg.window_width, cfg.window_height
    kernel = _make_kernel(cfg, k, nc, nr, fb, want_residue)
    n_blocks = f // fb
    bspec = lambda shape: pl.BlockSpec(
        (fb,) + shape, lambda i: (i,) + (0,) * len(shape))
    return pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[bspec((h + 1, 3 * (w + 1))), bspec((k, 3 * k)),
                  bspec((6,)), bspec((4,))],
        out_specs=[bspec((2,)), bspec((4,)), bspec((1,))],
        out_shape=[jax.ShapeDtypeStruct((f, 2), jnp.float32),
                   jax.ShapeDtypeStruct((f, 4), jnp.int32),
                   jax.ShapeDtypeStruct((f, 1), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret_mode(),
    )


def lk_level_inner(p1w, p2, fstate, istate, cfg: TrackingConfig, k: int,
                   nc: int, nr: int, want_residue: bool = True):
    """Run the masked Newton loop for one level on resident patches.

    p1w: [F, h+1, 3*(w+1)] first-image raw windows; p2: [F, K, 3K]
    second-image patches; fstate: [F, 6] f32 (x2, y2, ax1, ay1, a2x,
    a2y); istate: [F, 4] i32 (status, iters, done, oob1).

    Returns ([F, 2] f32 (x2, y2), [F, 4] i32 (status, iters, done,
    stall), [F, 1] f32 residue).  Large feature counts are processed in
    FEATURE_BLOCK-sized grid steps (padded lanes ride along as done).
    """
    f = p2.shape[0]
    fb = f if f <= FEATURE_BLOCK else FEATURE_BLOCK
    pad = (-f) % fb
    if pad:
        zf = lambda a: jnp.pad(a, ((0, pad),) + ((0, 0),) * (a.ndim - 1))
        p1w, p2, fstate = zf(p1w), zf(p2), zf(fstate)
        # padded lanes: done=1 so the loop ignores them
        ipad = jnp.zeros((pad, 4), jnp.int32).at[:, IDONE].set(1)
        istate = jnp.concatenate([istate, ipad])
    call = _inner_call(cfg, k, nc, nr, f + pad, fb, want_residue)
    fout, iout, res = call(p1w, p2, fstate, istate)
    if pad:
        fout, iout, res = fout[:f], iout[:f], res[:f]
    return fout, iout, res
