"""Flattened-lane Lucas-Kanade level kernel (v2).

Same contract as pallas/lk.py's lk_level_inner, but each feature's
whole patch lives in the LANE dimension of a rank-2 array:

    p[F, J],   J = r * (3K) + c * K + i        (row, channel, column)

so a K x 3K f32 patch occupies K*3K = 768 lanes = exactly 6 (8,128)
vector tiles with ZERO padding, where the v1 layout [F, K, 3K] padded
48 lanes up to 128 (2 full vregs per feature, 62% wasted).  Every
per-iteration step becomes static lane-rolls + masked selects on
[F, 768] arrays:

  * window selection (integer offsets oy, ox) — binary-decomposed
    masked static rolls (8 select steps for oy, ox in [0, 15]);
  * bilinear blend — 3 static rolls (+1 lane, +RS lanes, +RS+1) and
    4 fused multiply-adds, all channels at once;
  * diff/grad-sum — ONE multiply-add with a per-channel sign mask;
  * the five Newton sums — 3 elementwise products against
    channel-rotated copies, then ONE segmented roll-tree reduction per
    product array (valid lanes pre-masked; wrap pollution only touches
    lanes that are never read);
  * per-feature scalars stay [F, 1] exactly as v1.

Semantics are identical to v1 (and therefore to the C reference's
_trackFeature, src/V1/trackFeatures.c:381-486): same status codes,
check order, stall/re-anchor behavior, f32 arithmetic.
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

# packed f32 state columns (same as v1)
FX2, FY2, FAX1, FAY1, FA2X, FA2Y = range(6)
# int state: v2 adds the first-image window offset (IO1Y, IO1X) inside
# the p1 canvas — 0 for a window-at-origin extraction (the classic
# path), or the in-canvas position when the caller re-uses the
# previous step's p2 canvas as this step's p1 (sequential-mode carry:
# stack2(t-1) IS stack1(t), so the last re-anchor round's canvas
# already holds the first-image window bit-exactly)
ISTATUS, IITERS, IDONE, IOOB1, IO1Y, IO1X = range(6)


def _make_kernel(cfg: TrackingConfig, k: int, nc: int, nr: int, f: int,
                 layout: str = "rc", want_residue: bool = True,
                 iter_cap: int = 0, ny_eff: int = 0):
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
    # ny_eff < k: the canvas geometry stays k x k lanes, but only the
    # first ny_eff rows hold extracted image data (the rest are zero
    # pad that is never read) — the y re-anchor bound tightens to
    # match, so a lane whose window would enter the pad STALLS instead
    # and resumes bit-exactly in the (compacted) tail rounds.
    # Extraction MACs and band traffic scale with the extracted rows.
    nyk = ny_eff if ny_eff else k
    assert h + 1 < nyk <= k
    n_off_y = nyk - (h + 1) + 1  # valid in-patch row offsets
    if layout == "rc":       # lane J = r*3K + c*K + i (canvas order)
        rs, cs = 3 * k, k
    else:                    # "cr": J = c*K^2 + r*K + i — the NATIVE
        #                      flattening of a [3, K, K] block gather,
        #                      so the XLA-side reshape is free
        rs, cs = k, k * k
    L = 3 * k * k            # total patch lanes
    # Post-shift working length: once the window is shifted to the
    # canvas origin, blend/products/reduction trees only read a lane
    # prefix — slicing the shifted canvas to the next 128-lane multiple
    # cuts the per-iteration vector cost by L/L2 on everything
    # downstream of shift_to (default geometry: 768 -> 512 lanes).
    # Two read bounds:
    #   * blend/products: (h+1)*rs + 2*cs + (w+1) + rs + 2 (window
    #     extent + the B2 channel roll + the bilinear +rs+1 tap);
    #   * the reduce_win roll tree spans NEXT-POW2(h+1) rows and
    #     next-pow2(w+1) cols from read lane 2*cs — its taps beyond
    #     the window are zero (m_win-masked) only if those lanes EXIST
    #     unwrapped.  (A 576-lane slice at h=9 wrapped the s=384 roll
    #     back onto lane 0, double-counting its own partial sum —
    #     caught by the window-geometry fuzz matrix.)
    _np2 = lambda v: 1 << (v - 1).bit_length()
    _need = max((h + 1) * rs + 2 * cs + (w + 1) + rs + 2,
                2 * cs + (_np2(h + 1) - 1) * rs + _np2(w + 1))
    L2 = min(L, -(-_need // 128) * 128)

    def rollL(x, s):
        """Static left-rotation by s lanes (length-parametric)."""
        if s == 0:
            return x
        n = x.shape[-1]
        return pltpu.roll(x, n - s, 1)

    def window_oob(x, y):
        return ((x - hw < 0.0) | (ncf - (x + hw) < _EPS) |
                (y - hh < 0.0) | (nrf - (y + hh) < _EPS))

    def lane_masks(n=L):
        """Lane-geometry masks built in-kernel from an iota (Pallas
        forbids captured array constants): (m_win, m_c0, sign)."""
        jl = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
        if layout == "rc":
            lane_r = jl // rs
            rem = jl % rs
            lane_c = rem // cs
            lane_i = rem % cs
        else:
            lane_c = jl // cs
            rem = jl % cs
            lane_r = rem // rs
            lane_i = rem % rs
        m_win = ((lane_r < h) & (lane_i < w)).astype(jnp.float32)
        m_c0 = m_win * (lane_c == 0).astype(jnp.float32)
        sign = jnp.where(lane_c == 0, jnp.float32(-1.0),
                         jnp.float32(1.0))
        return m_win, m_c0, sign

    def blend(x, ax, ay):
        """Bilinear 4-term blend, all channels at once.  ax, ay [F, 1]."""
        t01 = rollL(x, 1)
        t10 = rollL(x, rs)
        t11 = rollL(x, rs + 1)
        return ((1 - ax) * (1 - ay) * x + ax * (1 - ay) * t01 +
                (1 - ax) * ay * t10 + ax * ay * t11)

    # The x-bit rolls can run on the L2-sliced canvas (4 vregs instead
    # of 6) iff the slice's wrap margin is never read: cumulative
    # x-shift wraps at most the top n_off_x - 1 lanes, so the highest
    # read lane (_need - 1) must stay below L2 - (n_off_x - 1).  The
    # value in every read lane is identical either way (lane-rolls
    # compose to the same total shift), so this is bit-exact.
    _slice_mid = L2 < L and (_need + n_off_x - 1 <= L2)

    def shift_to(x, oy, ox):
        """Masked binary static rolls by oy*rs + ox lanes, returning
        the L2-sliced shifted canvas.  Selection via jnp.where
        (2 ops/step) instead of the arithmetic bit*rolled + (1-bit)*x
        blend (4 ops/step).  y bits run at full canvas width; when the
        wrap-margin bound holds, x bits run on the slice."""
        b = 1
        while b < n_off_y:
            x = jnp.where((oy & b) != 0, rollL(x, b * rs), x)
            b *= 2
        if _slice_mid:
            x = x[:, :L2]
        b = 1
        while b < n_off_x:
            x = jnp.where((ox & b) != 0, rollL(x, b), x)
            b *= 2
        if not _slice_mid:
            x = x[:, :L2]
        return x

    def reduce_win(x):
        """Segmented window sum: lane (r=0, c*cs, i=0) of each channel
        block ends up holding that channel's window total."""
        s = 1
        while s < w + 1:          # column tree (valid cols pre-masked)
            x = x + rollL(x, s)
            s *= 2
        s = rs
        while s < (h + 1) * rs:   # row tree
            x = x + rollL(x, s)
            s *= 2
        return x

    def kernel(p1_ref, p2_ref, fs_ref, is_ref, fso, iso, reso):
        p2 = p2_ref[:]
        fs = fs_ref[:]
        a2x = fs[:, FA2X:FA2X + 1]
        a2y = fs[:, FA2Y:FA2Y + 1]
        a2xi = a2x.astype(jnp.int32)
        a2yi = a2y.astype(jnp.int32)
        oob1 = is_ref[:, IOOB1:IOOB1 + 1] != 0

        m_win, m_c0, sign = lane_masks(L2)

        o1y = jnp.clip(is_ref[:, IO1Y:IO1Y + 1], 0, n_off_y - 1)
        o1x = jnp.clip(is_ref[:, IO1X:IO1X + 1], 0, n_off_x - 1)
        b1 = blend(shift_to(p1_ref[:], o1y, o1x),
                   fs[:, FAX1:FAX1 + 1], fs[:, FAY1:FAY1 + 1])
        if lighting:
            r1 = reduce_win(b1 * m_c0)
            rq1 = reduce_win(b1 * b1 * m_c0)
            sum_g1 = r1[:, 0:1]
            sum_g1sq = rq1[:, 0:1]

        def sample(x2c, y2c):
            xt = x2c.astype(jnp.int32)
            yt = y2c.astype(jnp.int32)
            ax = x2c - xt.astype(jnp.float32)
            ay = y2c - yt.astype(jnp.float32)
            ox = xt - hwi - a2xi
            oy = yt - hhi - a2yi
            # In-loop stall bounds are one offset STRICTER than the
            # canvas allows: the post-loop residue samples at the
            # final position, which a converged lane's last sub-th
            # update can push one integer row/col past its last
            # in-loop sample — reserving the boundary offsets keeps
            # that clip-free (exact, like the reference's
            # _computeIntensityDifference at the final position).
            # Where the canvas anchor is image-CLIPPED the canvas edge
            # IS the image edge, so the boundary offset is exact and
            # the stall would never help — relax it there (a crossing
            # past the image edge is caught by the final OOB check).
            # Geometries too tight to give up an offset (n_off < 4)
            # keep the permissive bounds (the pre-existing clamped-
            # residue behavior).
            if n_off_x >= 4:
                lo_x = jnp.where(a2xi == 0, 0, 1)
                hi_x = jnp.where(a2xi == nc - k, n_off_x - 1,
                                 n_off_x - 2)
            else:
                lo_x, hi_x = 0, n_off_x - 1
            if n_off_y >= 4:
                lo_y = jnp.where(a2yi == 0, 0, 1)
                hi_y = jnp.where(a2yi == nr - nyk, n_off_y - 1,
                                 n_off_y - 2)
            else:
                lo_y, hi_y = 0, n_off_y - 1
            ovf = (ox < lo_x) | (ox > hi_x) | (oy < lo_y) | (oy > hi_y)
            oxc = jnp.clip(ox, 0, n_off_x - 1)
            oyc = jnp.clip(oy, 0, n_off_y - 1)
            win = shift_to(p2, oyc, oxc)
            return blend(win, ax, ay), ovf

        def newton(b2):
            if lighting:
                r2 = reduce_win(b2 * m_c0)
                rq2 = reduce_win(b2 * b2 * m_c0)
                sum_g2 = r2[:, 0:1]
                sum_g2sq = rq2[:, 0:1]
                alpha = jnp.sqrt((sum_g1sq / area) /
                                 (sum_g2sq / area))
                beta = sum_g1 / area - alpha * (sum_g2 / area)
                # reference's gradient gain uses the PLAIN means
                # (misnamed accumulators, src/V1/trackFeatures.c:180)
                alpha_g = jnp.sqrt((sum_g1 / area) / (sum_g2 / area))
                coeff = alpha_g + (-alpha - alpha_g) * m_c0
                C = b1 + b2 * coeff - beta * m_c0
            else:
                C = b1 + b2 * sign  # [diff | gradx sum | grady sum]
            B = rollL(C, cs)
            B2 = rollL(C, 2 * cs)
            # Five window sums packed into TWO reduction trees (each
            # tree yields one sum per channel slot): slot-select the
            # products so
            #   A1 = [diff*gx | gx*gy | gy*gy],
            #   A2 = [diff*gy | gx*gx |   --  ]
            # — 2 trees instead of 3 (the trees are the per-iteration
            # vector-cost floor of the kernel).
            CB = C * B
            CC = C * C
            jl = jax.lax.broadcasted_iota(jnp.int32, (1, L2), 1)
            if layout == "rc":
                lc = (jl % rs) // cs
            else:
                lc = jl // cs
            A1 = jnp.where(lc == 2, CC, CB) * m_win
            A2 = jnp.where(lc == 1, CC, C * B2) * m_win
            R1 = reduce_win(A1)
            R2 = reduce_win(A2)
            ex = R1[:, 0:1] * step            # diff * gradx
            gxy = R1[:, cs:cs + 1]            # gradx * grady
            gyy = R1[:, 2 * cs:2 * cs + 1]    # grady * grady
            ey = R2[:, 0:1] * step            # diff * grady
            gxx = R2[:, cs:cs + 1]            # gradx * gradx
            det = gxx * gyy - gxy * gxy
            small = det < min_det
            det_safe = jnp.where(small, jnp.float32(1.0), det)
            dx = (gyy * ex - gxy * ey) / det_safe
            dy = (gxx * ey - gxy * ex) / det_safe
            return dx, dy, small, C

        def body(state):
            x2c, y2c, status, iters, done_i = state[:5]
            done = done_i != 0
            oob = oob1 | window_oob(x2c, y2c)
            status = jnp.where(~done & oob, OOB, status)
            done = done | oob

            b2, ovf = sample(x2c, y2c)
            stall = ~done & ovf
            eff = ~done & ~ovf

            dx, dy, small, _ = newton(b2)
            status = jnp.where(eff & small, SMALL_DET, status)
            done = done | (eff & small)

            upd = eff & ~small
            x2c = x2c + jnp.where(upd, dx, 0.0)
            y2c = y2c + jnp.where(upd, dy, 0.0)
            iters = iters + upd.astype(jnp.int32)
            conv = (jnp.abs(dx) < th) & (jnp.abs(dy) < th)
            done = done | (upd & (conv | (iters >= max_iter)))
            return (x2c, y2c, status, iters, done.astype(jnp.int32),
                    jnp.any(stall).astype(jnp.int32),
                    state[6] + 1)

        def going(state):
            done_i, stalled, local = state[4], state[5], state[6]
            go = jnp.any(done_i == 0) & (stalled == 0)
            if iter_cap:
                # per-launch cap: not-done lanes exit like a stall and
                # resume bit-exactly in the (compacted) tail rounds —
                # a forced stall at `iter_cap` trips (the lane's
                # trajectory is independent of where the launch
                # boundary falls, same invariant as re-anchor stalls)
                go = go & (local < iter_cap)
            return go

        x2f, y2f, status, iters, done_i, _, _ = jax.lax.while_loop(
            going, body,
            (fs[:, FX2:FX2 + 1], fs[:, FY2:FY2 + 1],
             is_ref[:, ISTATUS:ISTATUS + 1], is_ref[:, IITERS:IITERS + 1],
             is_ref[:, IDONE:IDONE + 1], jnp.int32(0), jnp.int32(0)))

        if want_residue:
            # residue at the final (clamped) position
            b2, _ = sample(x2f, y2f)
            if lighting:
                _, _, _, C = newton(b2)
                diff = C
            else:
                diff = b1 + b2 * sign
            res = reduce_win(jnp.abs(diff) * m_c0)[:, 0:1] / area
        else:
            # residue is consumed only at the finest level (the level
            # loop overwrites LARGE_RESIDUE, src/V1/trackFeatures.c:
            # 1378: only SMALL_DET/OOB break) — coarser levels skip
            # the final sample + reduction
            res = jnp.zeros_like(x2f)

        fso[:] = jnp.concatenate([x2f, y2f], axis=1)
        iso[:] = jnp.concatenate(
            [status, iters, done_i, (done_i == 0).astype(jnp.int32)],
            axis=1)
        reso[:] = res

    return kernel


def supported(cfg: TrackingConfig, k: int, layout: str = "rc") -> bool:
    """True iff the flattened-lane geometry is wrap-safe: lanes the
    blend reads after the largest window shift must not collide with
    roll-wrapped garbage at the top of the patch."""
    w, h = cfg.window_width, cfg.window_height
    rs, cs = (3 * k, k) if layout == "rc" else (k, k * k)
    n_off_x = k - (w + 1) + 1
    n_off_y = k - (h + 1) + 1
    max_read = (h - 1) * rs + 2 * cs + (w - 1) + rs + 1
    max_shift = (n_off_y - 1) * rs + (n_off_x - 1)
    return max_read < 3 * k * k - max_shift


import os

# Feature-axis grid-block size.  Each grid block runs its OWN
# while_loop, so smaller blocks exit earlier when their lanes converge
# (at batched feature counts the per-block iteration max approaches
# max_iterations with 512 lanes/block); env-tunable for measurement.
FEATURE_BLOCK = int(os.environ.get("KLT_TPU_FEATURE_BLOCK", "512"))


@functools.lru_cache(maxsize=64)
def _inner_call(cfg: TrackingConfig, k: int, nc: int, nr: int, f: int,
                fb: int, layout: str, want_residue: bool = True,
                iter_cap: int = 0, ny_eff: int = 0):
    from . import interpret_mode
    kernel = _make_kernel(cfg, k, nc, nr, fb, layout, want_residue,
                          iter_cap, ny_eff)
    n_blocks = f // fb
    L = 3 * k * k
    bspec = lambda lanes: pl.BlockSpec((fb, lanes), lambda i: (i, 0))
    return pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[bspec(L), bspec(L), bspec(6), bspec(6)],
        out_specs=[bspec(2), bspec(4), bspec(1)],
        out_shape=[jax.ShapeDtypeStruct((f, 2), jnp.float32),
                   jax.ShapeDtypeStruct((f, 4), jnp.int32),
                   jax.ShapeDtypeStruct((f, 1), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret_mode(),
    )


def lk_level_inner_flat(p1, p2, fstate, istate, cfg: TrackingConfig,
                        k: int, nc: int, nr: int, layout: str = "rc",
                        want_residue: bool = True, iter_cap: int = 0,
                        ny_eff: int = 0):
    """v2 entry: p1, p2 are [F, 3*k*k] flattened-lane patches sharing
    the SAME canvas geometry.  p1 holds the (h+1) x (w+1) first-image
    window at canvas offset (istate[:, IO1Y], istate[:, IO1X]) — (0, 0)
    for a plain extraction, or the carried-canvas position.

    Returns ([F, 2] f32, [F, 4] i32, [F, 1] f32) like v1."""
    f = p2.shape[0]
    if f <= FEATURE_BLOCK:
        fb = f
    else:
        # smallest even block split <= FEATURE_BLOCK (8-aligned): e.g.
        # f=2400 -> 5 blocks of 480 with NO padding, where a fixed 512
        # block would pad to 2560 (~30 us/step of pure pad copies)
        f8 = -(-f // 8) * 8
        nblocks = -(-f8 // FEATURE_BLOCK)
        fb = -(-f8 // nblocks // 8) * 8
    pad = (-f) % fb
    if pad:
        zf = lambda a: jnp.pad(a, ((0, pad), (0, 0)))
        p1, p2, fstate = zf(p1), zf(p2), zf(fstate)
        ipad = jnp.zeros((pad, 6), jnp.int32).at[:, IDONE].set(1)
        istate = jnp.concatenate([istate, ipad])
    call = _inner_call(cfg, k, nc, nr, f + pad, fb, layout,
                       want_residue, iter_cap, ny_eff)
    fout, iout, res = call(p1, p2, fstate, istate)
    if pad:
        fout, iout, res = fout[:f], iout[:f], res[:f]
    return fout, iout, res
