"""Fused Shi-Tomasi corner-response kernel (Pallas TPU).

One kernel computes the min-eigenvalue map from the gradient images:
three products, two separable box-filter passes each (shift-FMA on the
VPU), and the closed-form lambda-min — the dense scan the reference
does per-pixel with a window^2 loop (src/V1/selectGoodFeatures.c:394-424).
Used by feature (re)selection; in sequential replacement mode this runs
every frame (src/V1/selectGoodFeatures.c:342-348), so it shares the
pyramid kernel's fused, VMEM-resident design.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pyramid import _hconv, _vconv

_INT_LIMIT = 2147483583.0  # largest f32 below 2^31-1 (overflow clamp,
                           # src/V1/selectGoodFeatures.c:415-420)


@functools.lru_cache(maxsize=16)
def _response_call(h: int, w: int, ww: int, wh: int):
    ones_w = tuple([1.0] * ww)
    ones_h = tuple([1.0] * wh)

    def kernel(gx_ref, gy_ref, out_ref):
        gx = gx_ref[:]
        gy = gy_ref[:]

        def box(img):
            return _vconv(_hconv(img, ones_w), ones_h)

        gxx = box(gx * gx)
        gxy = box(gx * gy)
        gyy = box(gy * gy)
        lam = (gxx + gyy -
               jnp.sqrt((gxx - gyy) * (gxx - gyy) + 4.0 * gxy * gxy)) / 2.0
        out_ref[:] = jnp.minimum(lam, _INT_LIMIT)

    from . import interpret_mode
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((h, w), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret_mode(),
    )


def fused_corner_response(gradx: jax.Array, grady: jax.Array,
                          window_width: int, window_height: int):
    """Drop-in Pallas replacement for ops.selection.corner_response."""
    h, w = gradx.shape[-2], gradx.shape[-1]
    return _response_call(h, w, window_width, window_height)(gradx, grady)


def supported(shape) -> bool:
    h, w = shape[-2], shape[-1]
    return h * w * 4 * 7 <= 88 * 1024 * 1024
