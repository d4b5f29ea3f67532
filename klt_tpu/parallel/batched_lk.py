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

import jax
import jax.numpy as jnp
import numpy as np

from ..config import TrackingConfig, TRACKED, SMALL_DET, OOB
from ..ops.lk import (_window_oob, _final_status, _kernel_patch_size,
                      _track_level_gather, track_features_pyramid)
from ..ops.interp import pack_stack_channels, extract_packed_cb
from ..ops.pyramid import build_image_pyramids


def _track_level_kernel_batched(sp1, sp2, x1, y1, x2, y2, active,
                                cfg: TrackingConfig):
    """Batched variant of ops.lk._track_level_kernel.

    sp1/sp2: channel-PACKED stacks [B, H, 3W] (pack_stack_channels);
    coordinate/mask arrays [B, F].  One Pallas kernel invocation tracks
    all B*F features.
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
    margin_y = (k - (h + 1)) // 2
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
    if use_v2:
        from ..ops.interp import extract_flat, extract_flat_rows, \
            _ROWS_MIN_F
        inner = lk2.lk_level_inner_flat
        # formulation choice is by TOTAL feature count B*F (each vmap
        # lane only sees F, but the einsums batch over B)
        exfn = extract_flat_rows if n >= _ROWS_MIN_F else extract_flat
        exf = jax.vmap(exfn, in_axes=(0, 0, 0, None, None, None))
        p1w = exf(sp1, y10, x10, h + 1, w + 1, k).reshape(n, 3 * k * k)
        extract2 = lambda py0, px0: exf(sp2, py0, px0, k, k,
                                        k).reshape(n, 3 * k * k)
    else:
        inner = lk_level_inner
        extract = jax.vmap(extract_packed_cb,
                           in_axes=(0, 0, 0, None, None))
        p1w = extract(sp1, y10, x10, h + 1, w + 1).reshape(
            n, h + 1, 3 * (w + 1))
        extract2 = lambda py0, px0: extract(sp2, py0, px0, k,
                                            k).reshape(n, k, 3 * k)
    oob1_i = col(_window_oob(x1f, y1f, hw, hh, ncf, nrf).astype(jnp.int32))

    def anchors(x2c, y2c):
        py0 = jnp.clip(y2c.astype(jnp.int32) - hhi - margin_y, 0, nr - k)
        px0 = jnp.clip(x2c.astype(jnp.int32) - hwi - margin_x, 0, nc - k)
        return py0, px0

    x2f0, y2f0 = flat(x2), flat(y2)
    status0 = jnp.full((n,), TRACKED, jnp.int32)
    iters0 = jnp.zeros((n,), jnp.int32)
    done0 = (~active).reshape(n).astype(jnp.int32)

    def round_once(x2c, y2c, status, iters, done):
        py0, px0 = anchors(x2c.reshape(b, f), y2c.reshape(b, f))
        p2 = extract2(py0, px0)
        fstate = jnp.concatenate(
            [col(x2c), col(y2c), ax1c, ay1c,
             col(px0.astype(jnp.float32)), col(py0.astype(jnp.float32))],
            axis=1)
        istate = jnp.concatenate(
            [col(status), col(iters), col(done), oob1_i], axis=1)
        fout, iout, resn = inner(p1w, p2, fstate, istate,
                                 cfg, k, nc, nr)
        return (fout[:, 0], fout[:, 1], iout[:, 0], iout[:, 1],
                iout[:, 2], resn)

    # straight-line re-anchor rounds (see ops.lk: the same body inside
    # lax.while_loop measures far slower; extra rounds are
    # deterministic no-ops for converged lanes)
    x2c, y2c, status, iters, done, residue = round_once(
        x2f0, y2f0, status0, iters0, done0)
    for _ in range(cfg.reanchor_unroll):
        x2c, y2c, status, iters, done, residue = round_once(
            x2c, y2c, status, iters, done)

    def outer(state):
        rounds, x2c, y2c, status, iters, done, _ = state
        out = round_once(x2c, y2c, status, iters, done)
        return (rounds + 1,) + out

    def outer_going(state):
        rounds, done = state[0], state[5]
        return jnp.any(done == 0) & (rounds < cfg.max_iterations + 1)

    _, x2c, y2c, status, iters, _, residue = jax.lax.while_loop(
        outer_going, outer,
        (jnp.int32(0), x2c, y2c, status, iters, done, residue))

    status = _final_status(status, iters, x2c, y2c, residue[:, 0],
                           hw, hh, ncf, nrf, cfg)
    act = active.reshape(n)
    x2c = jnp.where(act, x2c, x2f0)
    y2c = jnp.where(act, y2c, y2f0)
    status = jnp.where(act, status, TRACKED)
    return (x2c.reshape(b, f), y2c.reshape(b, f),
            status.reshape(b, f), iters.reshape(b, f))


def _unpack_stack(sp):
    """[B, H, 3W] packed -> [B, 3, H, W] (fallback paths only)."""
    b, h, cw = sp.shape
    w = cw // 3
    return sp.reshape(b, h, 3, w).transpose(0, 2, 1, 3)


def _track_level_batched(sp1, sp2, x1, y1, x2, y2, active,
                         cfg: TrackingConfig):
    """Batched track_level with ops.lk.track_level's static shape
    dispatch: a level smaller than the tracking window is all-OOB, and
    a level smaller than the kernel patch falls back to the per-sequence
    gather oracle — so batched results match the single-sequence path
    on degenerate pyramid shapes (e.g. 48x48 frames).

    sp1/sp2: channel-packed [B, H, 3W] level stacks — the layout the
    kernel path consumes directly (the fallback unpacks)."""
    w, h = cfg.window_width, cfg.window_height
    nr, nc = sp1.shape[-2], sp1.shape[-1] // 3
    if nr < h + 1 or nc < w + 1:
        status = jnp.where(active, jnp.int32(OOB), jnp.int32(TRACKED))
        return x2, y2, status, jnp.zeros_like(status)
    from ..pallas import pallas_enabled
    k = _kernel_patch_size(nr, nc, cfg)
    if (pallas_enabled() and min(nr, nc) >= k and max(h, w) + 3 <= k):
        return _track_level_kernel_batched(sp1, sp2, x1, y1,
                                           x2, y2, active, cfg)
    return jax.vmap(
        lambda s1, s2, a, b, c, d, m:
        _track_level_gather(s1, s2, a, b, c, d, m, cfg)
    )(_unpack_stack(sp1), _unpack_stack(sp2), x1, y1, x2, y2, active)


def track_features_pyramid_batched(sps1, sps2, x, y, val,
                                   cfg: TrackingConfig):
    """Batched coarse-to-fine driver: sps1/sps2 are finest-first lists
    of channel-PACKED [B, H_l, 3*W_l] level stacks (what the scan
    carries — packing happens once per frame, not per level access);
    x, y f32 [B, F]; val i32 [B, F].

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

    for r in range(nlev - 1, -1, -1):
        in_loop = alive & ~aborted
        xloc = jnp.where(in_loop, xloc * s, xloc)
        yloc = jnp.where(in_loop, yloc * s, yloc)
        xout = jnp.where(in_loop, xout * s, xout)
        yout = jnp.where(in_loop, yout * s, yout)

        x2, y2, st, _ = _track_level_batched(
            sps1[r], sps2[r], xloc, yloc, xout, yout, in_loop, cfg)

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
    return x_new, y_new, val_new


def _packed_stacks(imgs, cfg: TrackingConfig):
    """uint8 frames [B, H, W] -> finest-first tuple of channel-packed
    [B, H_l, 3*W_l] level stacks (ONE pack per level per frame)."""
    from ..ops.pyramid import build_pyramid_stacks
    sts = jax.vmap(lambda im: tuple(build_pyramid_stacks(im, cfg)))(imgs)
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

    The pallas on/off decision (env KLT_TPU_NO_PALLAS / backend) is part
    of the jit cache key, so toggling the env between calls retraces
    instead of silently reusing the stale compiled path."""
    from ..pallas import pallas_enabled
    return _track_sequences_batched(frames, x, y, val, cfg,
                                    pallas_enabled())


@functools.partial(jax.jit, static_argnums=(4, 5))
def _track_sequences_batched(frames, x, y, val, cfg: TrackingConfig,
                             use_pallas: bool):
    if use_pallas:
        # carry PACKED level stacks: pack once per frame, every level
        # access in the kernel path reads the packed layout directly
        def body(carry, t):
            sp1, xc, yc, vc = carry
            sp2 = _packed_stacks(frames[:, t], cfg)
            xn, yn, vn = track_features_pyramid_batched(
                sp1, sp2, xc, yc, vc, cfg)
            return (sp2, xn, yn, vn), (xn, yn, vn)

        sp0 = _packed_stacks(frames[:, 0], cfg)
        (_, xf, yf, vf), tables = jax.lax.scan(
            body, (sp0, x, y, val), jnp.arange(1, frames.shape[1]))
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
