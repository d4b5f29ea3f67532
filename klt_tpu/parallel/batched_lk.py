"""Natively-batched multi-sequence LK tracking.

`jax.vmap` over a `pallas_call` turns the batch into a sequential grid
dimension — B kernel launches back to back.  But the LK level kernel
never touches the images (only per-feature patches), so B sequences can
share ONE kernel invocation by flattening the feature axis to [B*F]:
patch extraction vmaps over the batch as ordinary batched matmuls on
the MXU, and everything downstream is feature-parallel.  This is the
throughput path for tracking many videos per chip (and, sharded over a
mesh's `data` axis, per pod slice).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from ..config import TrackingConfig, TRACKED, SMALL_DET, OOB
from ..ops.lk import (_window_oob, _final_status, _kernel_patch_size,
                      _track_level_gather, track_features_pyramid)
from ..ops.interp import pack_stack_channels, extract_packed_cb
from ..ops.pyramid import build_image_pyramids


def _scan_unroll() -> int:
    """KLT_TPU_SCAN_UNROLL: unroll factor for the whole-sequence scans
    (bit-exact — the same body inlined N times; trades compile time +
    code size for less per-step scan glue).  Trace-time, keyed via
    pallas_key."""
    import os
    return max(1, int(os.environ.get("KLT_TPU_SCAN_UNROLL", "1")))


def _track_level_kernel_batched(sp1, sp2, x1, y1, x2, y2, active,
                                cfg: TrackingConfig, carry_in=None,
                                want_carry=False, want_residue=True):
    """Batched variant of ops.lk._track_level_kernel.

    sp1/sp2: channel-PACKED stacks [B, H, 3W] (pack_stack_channels);
    coordinate/mask arrays [B, F].  One Pallas kernel invocation tracks
    all B*F features.

    Sequential-mode canvas carry (level 0 of the scan): `carry_in` is
    (canvas [B*F, 3k^2], qy0 [B*F], qx0 [B*F]) — the previous step's
    LAST re-anchor-round p2 canvas and anchors.  Because stack2(t-1) is
    stack1(t) and the kernel's non-stall invariant keeps the final
    position inside its canvas, the first-image window for this step
    already sits inside that canvas bit-exactly; the kernel samples it
    at offset (y10 - qy0, x10 - qx0) instead of paying a fresh one-hot
    image extraction.  Validity is all-or-nothing per step (border
    clips or a max-round stall on ANY active lane fall back to the
    extraction via lax.cond).  With `want_carry`, returns
    ((x2, y2, status, iters), carry_out) where carry_out is this
    step's last-round (canvas, qy0, qx0).
    """
    import os
    from ..pallas.lk import lk_level_inner

    b, nr, cw = sp1.shape
    nc = cw // 3
    f = x1.shape[1]
    n = b * f
    w, h = cfg.window_width, cfg.window_height
    hw, hh = np.float32(w // 2), np.float32(h // 2)
    hwi, hhi = w // 2, h // 2
    k = _kernel_patch_size(nr, nc, cfg)
    ncf, nrf = np.float32(nc), np.float32(nr)
    margin_x = (k - (w + 1)) // 2

    flat = lambda v: v.reshape(n)
    col = lambda v: v.reshape(n, 1)

    x1f, y1f = flat(x1), flat(y1)
    xt1 = x1.astype(jnp.int32)
    yt1 = y1.astype(jnp.int32)
    ax1c = col(x1 - xt1.astype(jnp.float32))
    ay1c = col(y1 - yt1.astype(jnp.float32))
    x10 = jnp.clip(xt1 - hwi, 0, nc - (w + 1))
    y10 = jnp.clip(yt1 - hhi, 0, nr - (h + 1))

    from ..pallas import lk2
    use_v2 = (os.environ.get("KLT_TPU_LK_V1", "0") != "1"
              and lk2.supported(cfg, k))
    from ..ops.lk import _p2_rows
    nyk = _p2_rows(k, h) if use_v2 else k  # short p2 canvas
    margin_y = (nyk - (h + 1)) // 2
    import functools as _ft
    if use_v2:
        from ..ops.interp import (extract_flat, extract_flat_rows,
                                  extract_flat_tiled, _ROWS_MIN_F,
                                  _TILED)
        inner = _ft.partial(lk2.lk_level_inner_flat,
                            want_residue=want_residue,
                            ny_eff=nyk)
        L = 3 * k * k
        # formulation choice is by TOTAL feature count B*F (each vmap
        # lane only sees F, but the einsums batch over B)
        exfn = ((extract_flat_tiled if _TILED else extract_flat_rows)
                if n >= _ROWS_MIN_F else extract_flat)
        exf = jax.vmap(exfn, in_axes=(0, 0, 0, None, None, None))

        def extract_p1():
            return exf(sp1, y10, x10, h + 1, w + 1, k).reshape(n, L)

        o1_zero = jnp.zeros((n, 2), jnp.int32)
        if carry_in is None:
            p1w = extract_p1()
            o1_cols = o1_zero
        else:
            from ..ops.lk import _carry_p1_select
            cv, qy0p, qx0p = carry_in
            y10f, x10f = flat(y10), flat(x10)
            o1y = y10f - qy0p
            o1x = x10f - qx0p
            ok = ((o1y >= 0) & (o1y <= nyk - (h + 1)) &
                  (o1x >= 0) & (o1x <= k - (w + 1)))
            sp1_flat = sp1.reshape(b * nr, cw)

            def refresh_rows(idx):
                return extract_flat(
                    sp1_flat, jnp.take(y10f, idx) + (idx // f) * nr,
                    jnp.take(x10f, idx), h + 1, w + 1, k)

            p1w, o1_cols = _carry_p1_select(
                cv, o1y, o1x, ok, active.reshape(n), refresh_rows,
                extract_p1, o1_zero, n)
        extract2 = lambda py0, px0: exf(sp2, py0, px0, nyk, k,
                                        k).reshape(n, L)
    else:
        inner = _ft.partial(lk_level_inner, want_residue=want_residue)
        extract = jax.vmap(extract_packed_cb,
                           in_axes=(0, 0, 0, None, None))
        p1w = extract(sp1, y10, x10, h + 1, w + 1).reshape(
            n, h + 1, 3 * (w + 1))
        extract2 = lambda py0, px0: extract(sp2, py0, px0, k,
                                            k).reshape(n, k, 3 * k)
        o1_cols = None
        if want_carry:
            raise ValueError("canvas carry requires the v2 kernel")
    oob1_i = col(_window_oob(x1f, y1f, hw, hh, ncf, nrf).astype(jnp.int32))

    def anchors(x2c, y2c):
        py0 = jnp.clip(y2c.astype(jnp.int32) - hhi - margin_y, 0,
                       nr - nyk)
        px0 = jnp.clip(x2c.astype(jnp.int32) - hwi - margin_x, 0, nc - k)
        return py0, px0

    x2f0, y2f0 = flat(x2), flat(y2)
    status0 = jnp.full((n,), TRACKED, jnp.int32)
    iters0 = jnp.zeros((n,), jnp.int32)
    done0 = (~active).reshape(n).astype(jnp.int32)

    def round_once(x2c, y2c, status, iters, done, cap=0):
        py0, px0 = anchors(x2c.reshape(b, f), y2c.reshape(b, f))
        p2 = extract2(py0, px0)
        fstate = jnp.concatenate(
            [col(x2c), col(y2c), ax1c, ay1c,
             col(px0.astype(jnp.float32)), col(py0.astype(jnp.float32))],
            axis=1)
        icols = [col(status), col(iters), col(done), oob1_i]
        if use_v2:
            icols.append(o1_cols)
        istate = jnp.concatenate(icols, axis=1)
        if cap:  # v2-only static per-launch iteration cap
            fout, iout, resn = inner(p1w, p2, fstate, istate,
                                     cfg, k, nc, nr, iter_cap=cap)
        else:
            fout, iout, resn = inner(p1w, p2, fstate, istate,
                                     cfg, k, nc, nr)
        return (fout[:, 0], fout[:, 1], iout[:, 0], iout[:, 1],
                iout[:, 2], resn, p2, flat(py0), flat(px0))

    # shared re-anchor machinery (ops.lk._run_reanchor_tail):
    # straight-line / cond-gated unrolled rounds + the stall-compacted
    # while_loop tail.  This batched path is onehot-only, so the tail
    # extracts via extract_flat over the batch-flattened stack, with
    # the gathered lane's sequence index folded into the row offset.
    from ..ops.lk import (_run_reanchor_tail, _tail_compact_enabled,
                          _first_round_iter_cap)
    sp2_flat = sp2.reshape(b * nr, cw)

    def tail_extract(py0, px0, idx):
        return extract_flat(sp2_flat, py0 + (idx // f) * nr, px0,
                            nyk, k, k)

    tail_compact = _tail_compact_enabled(n, use_v2)
    first = round_once(x2f0, y2f0, status0, iters0, done0,
                       cap=_first_round_iter_cap(tail_compact))
    (x2c, y2c, status, iters, done, residue, p2l, py0l,
     px0l) = _run_reanchor_tail(
        first, round_once, tail_extract, anchors,
        p1w, ax1c, ay1c, oob1_i, o1_cols, inner,
        n, k, nc, nr, cfg, use_v2, tail_compact)

    status = _final_status(status, iters, x2c, y2c, residue[:, 0],
                           hw, hh, ncf, nrf, cfg)
    act = active.reshape(n)
    x2c = jnp.where(act, x2c, x2f0)
    y2c = jnp.where(act, y2c, y2f0)
    status = jnp.where(act, status, TRACKED)
    out = (x2c.reshape(b, f), y2c.reshape(b, f),
           status.reshape(b, f), iters.reshape(b, f))
    if want_carry:
        return out, (p2l, py0l, px0l)
    return out


def _unpack_stack(sp):
    """[B, H, 3W] packed -> [B, 3, H, W] (fallback paths only)."""
    b, h, cw = sp.shape
    w = cw // 3
    return sp.reshape(b, h, 3, w).transpose(0, 2, 1, 3)


def carry_eligible(nr: int, nc: int, cfg: TrackingConfig) -> bool:
    """STATIC predicate: level-0 canvas carry is available iff the
    batched v2 kernel path handles this level (mirrors the dispatch in
    _track_level_batched + the v2 check in _track_level_kernel_batched)."""
    import os
    from ..pallas import pallas_enabled
    from ..pallas import lk2
    w, h = cfg.window_width, cfg.window_height
    if nr < h + 1 or nc < w + 1:
        return False
    k = _kernel_patch_size(nr, nc, cfg)
    return (pallas_enabled() and min(nr, nc) >= k
            and max(h, w) + 3 <= k
            and os.environ.get("KLT_TPU_LK_V1", "0") != "1"
            and lk2.supported(cfg, k))


def _track_level_batched(sp1, sp2, x1, y1, x2, y2, active,
                         cfg: TrackingConfig, carry_in=None,
                         want_carry=False, want_residue=True):
    """Batched track_level with ops.lk.track_level's static shape
    dispatch: a level smaller than the tracking window is all-OOB, and
    a level smaller than the kernel patch falls back to the per-sequence
    gather oracle — so batched results match the single-sequence path
    on degenerate pyramid shapes (e.g. 48x48 frames).

    sp1/sp2: channel-packed [B, H, 3W] level stacks — the layout the
    kernel path consumes directly (the fallback unpacks).  carry_in /
    want_carry: see _track_level_kernel_batched (callers must gate on
    carry_eligible)."""
    w, h = cfg.window_width, cfg.window_height
    nr, nc = sp1.shape[-2], sp1.shape[-1] // 3
    if nr < h + 1 or nc < w + 1:
        status = jnp.where(active, jnp.int32(OOB), jnp.int32(TRACKED))
        return x2, y2, status, jnp.zeros_like(status)
    from ..pallas import pallas_enabled
    k = _kernel_patch_size(nr, nc, cfg)
    if (pallas_enabled() and min(nr, nc) >= k and max(h, w) + 3 <= k):
        return _track_level_kernel_batched(sp1, sp2, x1, y1,
                                           x2, y2, active, cfg,
                                           carry_in=carry_in,
                                           want_carry=want_carry,
                                           want_residue=want_residue)
    assert not want_carry, "carry requires the kernel path"
    return jax.vmap(
        lambda s1, s2, a, b, c, d, m:
        _track_level_gather(s1, s2, a, b, c, d, m, cfg)
    )(_unpack_stack(sp1), _unpack_stack(sp2), x1, y1, x2, y2, active)


def track_features_pyramid_batched(sps1, sps2, x, y, val,
                                   cfg: TrackingConfig):
    """Batched coarse-to-fine driver (no canvas carry); see
    track_features_pyramid_batched_carry."""
    out = track_features_pyramid_batched_carry(sps1, sps2, x, y, val,
                                               cfg, carries=None,
                                               want_carry=False)
    return out[:3]


def track_features_pyramid_batched_carry(sps1, sps2, x, y, val,
                                         cfg: TrackingConfig,
                                         carries=None,
                                         want_carry=False):
    """Batched coarse-to-fine driver: sps1/sps2 are finest-first lists
    of channel-PACKED [B, H_l, 3*W_l] level stacks (what the scan
    carries — packing happens once per frame, not per level access);
    x, y f32 [B, F]; val i32 [B, F].

    carries/want_carry plumb the per-level canvas carries
    (sequential-mode p1 extraction reuse) through to the level kernel:
    a tuple with one (canvas, qy0, qx0) triple per carry_eligible
    level, finest-first.  The per-step validity check is what makes
    coarser levels safe too — their start positions shift by the
    finer-level refinement of the previous step, which usually stays
    inside the canvas margin and otherwise falls back to extraction.
    Returns (x, y, val, carries_out) with carries_out None unless
    want_carry.

    Mirrors ops.lk.track_features_pyramid's classification exactly."""
    s = np.float32(cfg.subsampling)
    nlev = cfg.n_pyramid_levels
    nr0, nc0 = sps1[0].shape[-2], sps1[0].shape[-1] // 3
    alive = val >= 0

    xloc, yloc = x, y
    for _ in range(nlev):
        xloc = xloc / s
        yloc = yloc / s
    xout, yout = xloc, yloc

    aborted = jnp.zeros_like(alive)
    last_status = jnp.full(x.shape, TRACKED, jnp.int32)

    elig = [carry_eligible(sp.shape[-2], sp.shape[-1] // 3, cfg)
            for sp in sps1]
    use_carry = want_carry or carries is not None
    # carries tuple holds one triple per eligible level, finest-first
    slot = {}
    j = 0
    for r in range(nlev):
        if elig[r]:
            slot[r] = j
            j += 1
    carries_out = [None] * j
    for r in range(nlev - 1, -1, -1):
        in_loop = alive & ~aborted
        xloc = jnp.where(in_loop, xloc * s, xloc)
        yloc = jnp.where(in_loop, yloc * s, yloc)
        xout = jnp.where(in_loop, xout * s, xout)
        yout = jnp.where(in_loop, yout * s, yout)

        if use_carry and elig[r]:
            cin = carries[slot[r]] if carries is not None else None
            (x2, y2, st, _), cout = _track_level_batched(
                sps1[r], sps2[r], xloc, yloc, xout, yout, in_loop,
                cfg, carry_in=cin, want_carry=True,
                want_residue=(r == 0))
            carries_out[slot[r]] = cout
        else:
            x2, y2, st, _ = _track_level_batched(
                sps1[r], sps2[r], xloc, yloc, xout, yout, in_loop, cfg,
                want_residue=(r == 0))

        xout = jnp.where(in_loop, x2, xout)
        yout = jnp.where(in_loop, y2, yout)
        last_status = jnp.where(in_loop, st, last_status)
        aborted = aborted | (in_loop & ((st == SMALL_DET) | (st == OOB)))

    bx = np.float32(cfg.borderx)
    by = np.float32(cfg.bordery)
    out_of_border = ((xout < bx) | (xout > np.float32(nc0 - 1) - bx) |
                     (yout < by) | (yout > np.float32(nr0 - 1) - by))
    final = jnp.where((last_status != OOB) & out_of_border, OOB,
                      last_status)
    lost = final != TRACKED
    x_new = jnp.where(alive, jnp.where(lost, jnp.float32(-1.0), xout), x)
    y_new = jnp.where(alive, jnp.where(lost, jnp.float32(-1.0), yout), y)
    val_new = jnp.where(alive, final, val)
    return x_new, y_new, val_new, (tuple(carries_out)
                                   if want_carry else None)


def _packed_stacks(imgs, cfg: TrackingConfig):
    """uint8 frames [B, H, W] -> finest-first tuple of channel-packed
    [B, H_l, 3*W_l] level stacks (ONE pack per level per frame).

    MEASURED NEGATIVE RESULT: emitting the packed layout directly from
    the fused pyramid kernel (in-kernel lane concat at non-128-aligned
    W) ran 2552 vs 2484 us/step at B=16 — the Mosaic concat relayout
    costs more than the XLA-side pack it replaces.  Keep the XLA pack.

    The build itself is the natively-batched pyramid kernel (one
    launch, multi-image grid tiles) — the r4 roofline's 13%-of-HBM
    latency hole was B sequential vmap instances."""
    from ..ops.pyramid import build_pyramid_stacks_batched
    sts = build_pyramid_stacks_batched(imgs, cfg)
    return tuple(jax.vmap(pack_stack_channels)(s) for s in sts)


def make_fused_pair_step(cfg: TrackingConfig):
    """Batched frame-pair step with ONE LK kernel invocation per level.

    step(img1 [B,H,W] u8, img2, x [B,N], y, val) -> (x, y, val).
    Falls back to the per-sequence vmap path off-TPU.
    """
    from ..pallas import pallas_enabled

    def step(img1, img2, x, y, val):
        if pallas_enabled():
            return track_features_pyramid_batched(
                _packed_stacks(img1, cfg), _packed_stacks(img2, cfg),
                x, y, val, cfg)
        pyrs1 = jax.vmap(lambda im: build_image_pyramids(im, cfg))(img1)
        pyrs2 = jax.vmap(lambda im: build_image_pyramids(im, cfg))(img2)
        return jax.vmap(
            lambda p1, g1x, g1y, p2, g2x, g2y, xx, yy, vv:
            track_features_pyramid(list(p1), list(g1x), list(g1y),
                                   list(p2), list(g2x), list(g2y),
                                   xx, yy, vv, cfg)
        )(pyrs1[0], pyrs1[1], pyrs1[2], pyrs2[0], pyrs2[1], pyrs2[2],
          x, y, val)

    return step


import functools


def track_sequences_batched(frames, x, y, val, cfg: TrackingConfig):
    """Track B sequences through T frames with device-resident pyramid
    carry and one LK kernel invocation per level per step.

    frames: uint8 [B, T, H, W]; x, y f32 [B, N]; val i32 [B, N].
    Returns (xs, ys, vals) of shape [T-1, B, N].

    The pallas on/off + interpret decision (env KLT_TPU_NO_PALLAS /
    KLT_TPU_PALLAS_INTERPRET / backend) and the KLT_TPU_PRECOMP_PYR
    toggle are part of the jit cache key, so toggling the env between
    calls retraces instead of silently reusing the stale compiled
    path."""
    from ..pallas import pallas_key
    precomp = os.environ.get("KLT_TPU_PRECOMP_PYR", "0") == "1"
    return _track_sequences_batched(frames, x, y, val, cfg,
                                    pallas_key(), precomp)


@functools.partial(jax.jit, static_argnums=(4, 5, 6))
def _track_sequences_batched(frames, x, y, val, cfg: TrackingConfig,
                             pallas_key=None, precomp: bool = False):
    use_pallas = pallas_key[0]
    # precomp (KLT_TPU_PRECOMP_PYR=1): build ALL T frames' pyramid
    # stacks in ONE batched launch (grid B*T instead of B) ahead of the
    # scan and feed them through scan xs — the per-step pyramid build
    # (latency-bound at B images/launch) leaves the critical loop
    # entirely.  Memory cost: the whole chunk's stacks stay resident
    # (f32 ~ 3.7 MB per 320x240 frame, ~14.7 MB per 640x480 frame) —
    # fine for bench chunks, keep OFF for unbounded streaming.
    # Bit-exact: identical stacks, identical per-step program.
    if use_pallas:
        # carry PACKED level stacks: pack once per frame, every level
        # access in the kernel path reads the packed layout directly.
        # When the level-0 kernel path is eligible, also carry the
        # last-round p2 canvas + anchors so the next step's p1 window
        # extraction is a free in-canvas shift (all-or-nothing per
        # step; invalid steps fall back to the extraction in-graph).
        if precomp:
            b, t_all = frames.shape[0], frames.shape[1]
            sp_bt = _packed_stacks(
                frames.reshape((b * t_all,) + frames.shape[2:]), cfg)
            # [B*T, H, 3W] (b-major) -> per-level ([B,H,3W] at t=0,
            # [T-1, B, H, 3W] stream for the scan)
            sp0 = tuple(sp.reshape((b, t_all) + sp.shape[1:])[:, 0]
                        for sp in sp_bt)
            sp_xs = tuple(
                sp.reshape((b, t_all) + sp.shape[1:])[:, 1:]
                .swapaxes(0, 1) for sp in sp_bt)
        else:
            sp0 = _packed_stacks(frames[:, 0], cfg)
        from ..ops.lk import make_carry_init
        n = x.shape[0] * x.shape[1]
        c0 = []
        for sp in sp0:
            nr_l, nc_l = sp.shape[-2], sp.shape[-1] // 3
            if carry_eligible(nr_l, nc_l, cfg):
                k_l = _kernel_patch_size(nr_l, nc_l, cfg)
                c0.append(make_carry_init(n, k_l))
        if c0:
            c0 = tuple(c0)

            def body(carry, xs):
                sp1, cc, xc, yc, vc = carry
                sp2 = xs if precomp else _packed_stacks(
                    frames[:, xs], cfg)
                xn, yn, vn, cn = track_features_pyramid_batched_carry(
                    sp1, sp2, xc, yc, vc, cfg, carries=cc,
                    want_carry=True)
                return (sp2, cn, xn, yn, vn), (xn, yn, vn)

            (_, _, xf, yf, vf), tables = jax.lax.scan(
                body, (sp0, c0, x, y, val),
                sp_xs if precomp else jnp.arange(1, frames.shape[1]),
                unroll=_scan_unroll())
            return tables

        def body(carry, xs):
            sp1, xc, yc, vc = carry
            sp2 = xs if precomp else _packed_stacks(frames[:, xs], cfg)
            xn, yn, vn = track_features_pyramid_batched(
                sp1, sp2, xc, yc, vc, cfg)
            return (sp2, xn, yn, vn), (xn, yn, vn)

        (_, xf, yf, vf), tables = jax.lax.scan(
            body, (sp0, x, y, val),
            sp_xs if precomp else jnp.arange(1, frames.shape[1]),
            unroll=_scan_unroll())
        return tables

    vpyr = jax.vmap(lambda im: build_image_pyramids(im, cfg))

    def tfp(p1, p2, x, y, v):
        return jax.vmap(
            lambda a, b, c, d, e, f, xx, yy, vv:
            track_features_pyramid(list(a), list(b), list(c), list(d),
                                   list(e), list(f), xx, yy, vv, cfg)
        )(p1[0], p1[1], p1[2], p2[0], p2[1], p2[2], x, y, v)

    def pyr_tuple(imgs):
        p, gx, gy = vpyr(imgs)
        return tuple(p), tuple(gx), tuple(gy)

    p0 = pyr_tuple(frames[:, 0])

    def body(carry, t):
        p1, xc, yc, vc = carry
        p2 = pyr_tuple(frames[:, t])
        xn, yn, vn = tfp(p1, p2, xc, yc, vc)
        return (p2, xn, yn, vn), (xn, yn, vn)

    (_, xf, yf, vf), tables = jax.lax.scan(
        body, (p0, x, y, val), jnp.arange(1, frames.shape[1]))
    return tables
