"""Batched Lucas-Kanade Newton loop as one Pallas TPU kernel per level.

The TPU analogue of the reference's V3 per-feature device tracker
(trackFeaturesKernel, src/V3/trackFeaturesGPUcu:191-281), re-thought for
vector lanes instead of CUDA blocks: all F features advance together,
one kernel invocation runs the ENTIRE masked Newton iteration loop of
one pyramid level in VMEM.  This removes the dominant costs of the XLA
formulation — per-iteration HLO op overhead and batched tiny einsums —
measured at ~34 us/iteration on a v5e; the in-kernel iteration is ~3 us.

Data layout (chosen for the Mosaic constraints of this toolchain: no
gathers, no dynamic lane indexing, no dynamic-shift rolls):
* per-feature patches `[F, K, 3*K]` f32 — K x K-pixel patches with the
  3 channels (intensity, gradx, grady) as contiguous K-lane blocks;
  extracted once per anchor round by the XLA-side one-hot matmuls
  (ops/interp.onehot_extract) and re-anchored only when a feature's
  Newton trajectory leaves its patch margin;
* window sampling inside the kernel is a 9-term masked sum over the
  possible integer offsets (a static unroll — each term is a static
  slice + compare + FMA on the VPU), followed by the 4-term bilinear
  blend; no dynamic addressing anywhere;
* per-feature scalars (positions, statuses, masks) live as `[F, 1]`
  f32/i32 vectors; reductions over the window produce `[F, 1]` directly
  so no transposes are needed.

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

from ..config import TrackingConfig, TRACKED, SMALL_DET, MAX_ITERATIONS, \
    OOB, LARGE_RESIDUE

_EPS = np.float32(1.001)  # reference: src/V1/trackFeatures.c:409


def _select_window(patch, oy, ox, h, w, k):
    """[F, h+1, 3*(w+1)] raw window at integer in-patch offsets.

    patch: [F, K, 3K]; oy, ox: [F, 1] i32 in [0, K-(h+1)] / [0, K-(w+1)].
    A static unroll per axis: term s contributes where oy == s.
    Returns rows [oy, oy+h+1) and, per channel block, pixels
    [ox, ox+w+1) — enough for the +1 bilinear shifts.
    """
    f = patch.shape[0]
    hh = h + 1
    ww = w + 1
    n_oy = k - hh + 1
    n_ox = k - ww + 1
    oy3 = oy[:, :, None]
    ox3 = ox[:, :, None]

    rows = jnp.zeros((f, hh, 3 * k), jnp.float32)
    for s in range(n_oy):
        m = (oy3 == s).astype(jnp.float32)
        rows = rows + m * patch[:, s:s + hh, :]

    win = jnp.zeros((f, hh, 3 * ww), jnp.float32)
    for t in range(n_ox):
        m = (ox3 == t).astype(jnp.float32)
        sl = jnp.concatenate(
            [rows[:, :, c * k + t:c * k + t + ww] for c in range(3)],
            axis=2)
        win = win + m * sl
    return win  # [F, h+1, 3*(w+1)]


def _blend(win, ax, ay, h, w):
    """Bilinear blend of the raw (h+1)x(w+1)-px window -> per-channel
    [F, h, w] stacks (g, gx, gy).  ax, ay: [F, 1] fractional parts."""
    ww = w + 1
    ax3 = ax[:, :, None]
    ay3 = ay[:, :, None]

    def px(dr, dc):
        return jnp.concatenate(
            [win[:, dr:dr + h, c * ww + dc:c * ww + dc + w]
             for c in range(3)], axis=2)

    p00 = px(0, 0)
    p01 = px(0, 1)
    p10 = px(1, 0)
    p11 = px(1, 1)
    out = ((1 - ax3) * (1 - ay3) * p00 + ax3 * (1 - ay3) * p01 +
           (1 - ax3) * ay3 * p10 + ax3 * ay3 * p11)  # [F, h, 3w]
    return out[:, :, 0:w], out[:, :, w:2 * w], out[:, :, 2 * w:3 * w]


def _wsum(x):
    """Window reduction [F, h, w] -> [F, 1] f32.

    Two single-axis sums (this toolchain's Mosaic crashes on multi-axis
    reductions), never materializing a 1-D array."""
    s2 = jnp.sum(x, axis=2, keepdims=True)       # [F, h, 1]
    return jnp.sum(s2[:, :, 0], axis=1, keepdims=True)  # [F, 1]


def _make_kernel(cfg: TrackingConfig, k: int, nc: int, nr: int, f: int):
    w, h = cfg.window_width, cfg.window_height
    hw, hh = np.float32(w // 2), np.float32(h // 2)
    hwi, hhi = w // 2, h // 2
    ncf, nrf = np.float32(nc), np.float32(nr)
    th = np.float32(cfg.min_displacement)
    area = np.float32(w * h)
    step = np.float32(cfg.step_factor)
    min_det = np.float32(cfg.min_determinant)
    max_res = np.float32(cfg.max_residue)
    max_iter = cfg.max_iterations
    lighting = cfg.lighting_insensitive
    n_off = k - (w + 1) + 1  # valid in-patch offsets

    def window_oob(x, y):
        return ((x - hw < 0.0) | (ncf - (x + hw) < _EPS) |
                (y - hh < 0.0) | (nrf - (y + hh) < _EPS))

    def gain_bias_diff(g1, g2):
        mean1 = _wsum(g1 * g1) / area
        mean2 = _wsum(g2 * g2) / area
        alpha = jnp.sqrt(mean1 / mean2)
        m1 = _wsum(g1) / area
        m2 = _wsum(g2) / area
        beta = m1 - alpha * m2
        return g1 - g2 * alpha[:, :, None] - beta[:, :, None]

    def kernel(p1w_ref, p2_ref, a2x_ref, a2y_ref, ax1_ref, ay1_ref,
               oob1_ref, x2_ref, y2_ref, st_ref, it_ref, dn_ref,
               x2o, y2o, sto, ito, dno, stallo, reso):
        p2 = p2_ref[:]
        a2x = a2x_ref[:]
        a2y = a2y_ref[:]
        oob1 = oob1_ref[:] != 0

        # first-image windows: fixed integer corner, blend once
        g1, gx1w, gy1w = _blend(p1w_ref[:], ax1_ref[:], ay1_ref[:], h, w)

        def offsets(x2c, y2c):
            xt = x2c.astype(jnp.int32)
            yt = y2c.astype(jnp.int32)
            ax = x2c - xt.astype(jnp.float32)
            ay = y2c - yt.astype(jnp.float32)
            ox = xt - hwi - a2x.astype(jnp.int32)
            oy = yt - hhi - a2y.astype(jnp.int32)
            ovf = ((ox < 0) | (ox > n_off - 1) |
                   (oy < 0) | (oy > n_off - 1))
            ox = jnp.clip(ox, 0, n_off - 1)
            oy = jnp.clip(oy, 0, n_off - 1)
            return oy, ox, ay, ax, ovf

        def sample(x2c, y2c):
            oy, ox, ay, ax, ovf = offsets(x2c, y2c)
            win = _select_window(p2, oy, ox, h, w, k)
            g2, gx2w, gy2w = _blend(win, ax, ay, h, w)
            return g2, gx2w, gy2w, ovf

        def newton(g2, gx2w, gy2w):
            if lighting:
                diff = gain_bias_diff(g1, g2)
                # gain from plain means (reference's misnamed
                # accumulators, src/V1/trackFeatures.c:180-220)
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
            # done carried as int32 (Mosaic: no bool vectors in carries)
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

        x2f, y2f, status, iters, done_i, stalled = jax.lax.while_loop(
            going, body,
            (x2_ref[:], y2_ref[:], st_ref[:], it_ref[:],
             dn_ref[:], jnp.int32(0)))
        done = done_i != 0

        # residue at the final position from the (clamped) patch —
        # only consumed for lanes that are done and in-patch
        g2, _, _, ovf_r = sample(x2f, y2f)
        if lighting:
            diff = gain_bias_diff(g1, g2)
        else:
            diff = g1 - g2
        res = _wsum(jnp.abs(diff)) / area

        x2o[:] = x2f
        y2o[:] = y2f
        sto[:] = status
        ito[:] = iters
        dno[:] = done.astype(jnp.int32)
        stallo[:] = (~done).astype(jnp.int32)  # lanes needing re-anchor
        reso[:] = res

    return kernel


@functools.lru_cache(maxsize=64)
def _inner_call(cfg: TrackingConfig, k: int, nc: int, nr: int, f: int):
    w, h = cfg.window_width, cfg.window_height
    kernel = _make_kernel(cfg, k, nc, nr, f)
    fvec_f32 = jax.ShapeDtypeStruct((f, 1), jnp.float32)
    fvec_i32 = jax.ShapeDtypeStruct((f, 1), jnp.int32)
    return pl.pallas_call(
        kernel,
        out_shape=[fvec_f32, fvec_f32, fvec_i32, fvec_i32, fvec_i32,
                   fvec_i32, fvec_f32],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )


def lk_level_inner(p1w, p2, a2x, a2y, ax1, ay1, oob1, x2, y2, status,
                   iters, done, cfg: TrackingConfig, k: int,
                   nc: int, nr: int):
    """Run the masked Newton loop for one level on resident patches.

    p1w: [F, h+1, 3*(w+1)] first-image raw windows; p2: [F, K, 3K]
    second-image patches; a2*: [F, 1] f32 patch anchors; ax1/ay1: [F, 1]
    first-image fractional parts; oob1/done: [F, 1] i32 flags; x2/y2:
    [F, 1] f32; status/iters: [F, 1] i32.

    Returns (x2, y2, status, iters, done_i32, stall_i32, residue).
    """
    f = p2.shape[0]
    call = _inner_call(cfg, k, nc, nr, f)
    return call(p1w, p2, a2x, a2y, ax1, ay1, oob1, x2, y2, status,
                iters, done)
