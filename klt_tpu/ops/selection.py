"""Shi-Tomasi (min-eigenvalue) corner response and candidate extraction.

The dense structure-tensor scan (reference:
src/V1/selectGoodFeatures.c:394-424 — a window^2 loop per pixel) becomes
two separable box-filter convolutions over the gradient product maps, an
O(HW) bandwidth-bound pass that XLA fuses.  The inherently sequential
pieces — the tie-exact descending sort and the greedy minimum-distance
suppression — run in the native host runtime (klt_tpu/native), mirroring
the reference's own split where even the V3 GPU build keeps selection's
scalar logic on the CPU (src/V3/Makefile:23-24).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..config import TrackingConfig
from .convolve import _conv1d

_INT_LIMIT = np.float32(2147483583.0)  # largest f32 below 2^31-1


def corner_response(gradx: jax.Array, grady: jax.Array,
                    window_width: int, window_height: int) -> jax.Array:
    """Min-eigenvalue map of the windowed structure tensor.

    Valid wherever the window is fully interior; the candidate extractor
    only reads inside the border margin, matching the reference's scan
    bounds (src/V1/selectGoodFeatures.c:396-397).
    """
    from ..pallas import pallas_enabled
    if pallas_enabled():
        from ..pallas.selection import fused_corner_response, supported
        if supported(gradx.shape):
            return fused_corner_response(gradx, grady, window_width,
                                         window_height)

    ones_w = np.ones(window_width, dtype=np.float32)
    ones_h = np.ones(window_height, dtype=np.float32)

    def box(img):
        return _conv1d(_conv1d(img, ones_w, axis=1), ones_h, axis=0)

    gxx = box(gradx * gradx)
    gxy = box(gradx * grady)
    gyy = box(grady * grady)

    # reference: _minEigenvalue, src/V1/selectGoodFeatures.c:289-292
    lam = (gxx + gyy -
           jnp.sqrt((gxx - gyy) * (gxx - gyy) + 4.0 * gxy * gxy)) / 2.0
    return jnp.minimum(lam, _INT_LIMIT)  # int-capacity clamp (:415-420)


def candidate_points(response: np.ndarray, cfg: TrackingConfig,
                     ncols: int, nrows: int) -> np.ndarray:
    """Host-side pointlist [(x, y, int(val)), ...] in the reference's
    row-major scan order (src/V1/selectGoodFeatures.c:394-424).

    Returns int32 [n, 3].  Truncation toward zero matches the C cast.
    """
    window_hw = cfg.window_width // 2
    window_hh = cfg.window_height // 2
    borderx = max(cfg.borderx, window_hw)
    bordery = max(cfg.bordery, window_hh)
    step = cfg.n_skipped_pixels + 1

    ys = np.arange(bordery, nrows - bordery, step, dtype=np.int32)
    xs = np.arange(borderx, ncols - borderx, step, dtype=np.int32)
    vals = np.asarray(response)[np.ix_(ys, xs)].astype(np.int32)  # trunc

    gx, gy = np.meshgrid(xs, ys)
    pts = np.empty((vals.size, 3), dtype=np.int32)
    pts[:, 0] = gx.ravel()
    pts[:, 1] = gy.ravel()
    pts[:, 2] = vals.ravel()
    return pts
