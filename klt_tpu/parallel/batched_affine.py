"""Natively-batched multi-sequence affine-checked tracking.

The laptops-affine configuration is latency-bound single-stream: the
Gauss-Newton einsums and the translation kernel leave most of the chip
idle at N=2000 lanes.  This driver runs B sequences concurrently —
translation via the flattened [B*F] level kernel
(parallel/batched_lk.py), the affine consistency stage via
ops/affine.py's batched-image path (lane axis flattened seq-major over
[B, H, W] frames, so every einsum/solve in the Gauss-Newton loop is one
[B*N]-lane op and the compaction/repair cond predicates stay GLOBAL
scalars — a plain jax.vmap would select both branches of every cond
per sequence, paying the full-width fallbacks every step).

This is the affine analogue of the flagship's batched operating point
(the 47x -> 102x move of round 4): same per-lane arithmetic, same
parity contract per sequence, aggregate throughput scaling with B.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

from ..config import TrackingConfig
from ..ops.affine import _affine_step_jit, _PATCH_BORDER
from .batched_lk import (_packed_stacks, _unpack_stack, carry_eligible,
                         _scan_unroll,
                         track_features_pyramid_batched_carry)


def _unpack0(sp):
    """Packed level stack [B, H, 3W] -> (img, gx, gy) each [B, H, W]."""
    u = _unpack_stack(sp)
    return u[:, 0], u[:, 1], u[:, 2]


def track_sequences_affine_batched(frames, x, y, val,
                                   cfg: TrackingConfig):
    """Track B sequences with the affine consistency check inside one
    compiled scan.

    frames: uint8 [B, T, H, W]; x, y f32 [B, N]; val i32 [B, N].
    Returns (xs, ys, vals) of shape [T-1, B, N]."""
    from ..pallas import pallas_key
    precomp = os.environ.get("KLT_TPU_PRECOMP_PYR", "0") == "1"
    return _track_sequences_affine_batched(frames, x, y, val, cfg,
                                           pallas_key(), precomp)


@functools.partial(jax.jit, static_argnums=(4, 5, 6))
def _track_sequences_affine_batched(frames, x, y, val,
                                    cfg: TrackingConfig,
                                    pallas_key=None,
                                    precomp: bool = False):
    b, t_all = frames.shape[0], frames.shape[1]
    n = x.shape[1]
    nf = b * n

    pw = cfg.affine_window_width + _PATCH_BORDER
    ph = cfg.affine_window_height + _PATCH_BORDER
    z = jnp.zeros((nf, ph, pw), jnp.float32)
    v0 = jnp.zeros(nf, jnp.float32)
    aff0 = (jnp.zeros(nf, bool), z, z, z, v0, v0,
            jnp.ones(nf, jnp.float32), v0, v0, jnp.ones(nf, jnp.float32))

    if precomp:
        sp_bt = _packed_stacks(
            frames.reshape((b * t_all,) + frames.shape[2:]), cfg)
        sp0 = tuple(sp.reshape((b, t_all) + sp.shape[1:])[:, 0]
                    for sp in sp_bt)
        sp_xs = tuple(sp.reshape((b, t_all) + sp.shape[1:])[:, 1:]
                      .swapaxes(0, 1) for sp in sp_bt)
    else:
        sp0 = _packed_stacks(frames[:, 0], cfg)
        sp_xs = None

    from ..ops.lk import make_carry_init, _kernel_patch_size
    c0 = []
    for sp in sp0:
        nr_l, nc_l = sp.shape[-2], sp.shape[-1] // 3
        if carry_eligible(nr_l, nc_l, cfg):
            c0.append(make_carry_init(nf, _kernel_patch_size(nr_l, nc_l,
                                                             cfg)))
    c0 = tuple(c0) if c0 else None

    def body(carry, xs):
        sp1, cc, xc, yc, vc, aff = carry
        sp2 = xs if precomp else _packed_stacks(frames[:, xs], cfg)
        xn, yn, vn, cn = track_features_pyramid_batched_carry(
            sp1, sp2, xc, yc, vc, cfg, carries=cc,
            want_carry=cc is not None)
        i1, gx1, gy1 = _unpack0(sp1[0])
        i2, gx2, gy2 = _unpack0(sp2[0])
        out = _affine_step_jit(
            *aff, i1, gx1, gy1, i2, gx2, gy2,
            xc.reshape(-1), yc.reshape(-1), xn.reshape(-1),
            yn.reshape(-1), vn.reshape(-1), cfg, pallas_key)
        aff_new = tuple(out[:10])
        xo = out[10].reshape(b, n)
        yo = out[11].reshape(b, n)
        vo = out[12].reshape(b, n)
        return (sp2, cn, xo, yo, vo, aff_new), (xo, yo, vo)

    (_, _, xf, yf, vf, _), tables = jax.lax.scan(
        body, (sp0, c0, x, y, val, aff0),
        sp_xs if precomp else jnp.arange(1, t_all),
        unroll=_scan_unroll())
    return tables
