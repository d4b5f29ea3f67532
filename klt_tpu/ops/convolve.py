"""Separable convolution ops (smoothing + gradients), XLA path.

TPU-first design notes
----------------------
The reference walks each row/column with a scalar accumulator
(src/V1/convolve.c:137-242).  Here each pass is a single
`lax.conv_general_dilated` over the whole image — XLA tiles it onto the
MXU/VPU and fuses the border masking.  Semantics preserved from the
reference:

* taps are applied in reversed order (true convolution, not correlation) —
  the reference's inner loop walks taps from width-1 down to 0
  (src/V1/convolve.c:171-172);
* output borders within `radius` of the edge are ZEROED, not clamped or
  zero-padded (src/V1/convolve.c:163-178, :215-237) — and the vertical pass
  consumes the horizontally-zeroed intermediate, exactly like the C code;
* all accumulation stays in float32 (sub-pixel tolerance contract).

A Pallas fused kernel for the full smooth+gradient+subsample pyramid pass
lives in klt_tpu/pallas/; these jnp ops are the semantic reference and the
fallback path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def to_float_image(img: jax.Array) -> jax.Array:
    """uint8 frame -> float32 image (reference: src/V1/convolve.c:37-53)."""
    return img.astype(jnp.float32)


def _col_mask(ncols: int, radius: int) -> np.ndarray:
    m = np.ones((1, ncols), dtype=np.float32)
    if radius > 0:
        m[:, :radius] = 0.0
        m[:, ncols - radius:] = 0.0
    return m


def _row_mask(nrows: int, radius: int) -> np.ndarray:
    m = np.ones((nrows, 1), dtype=np.float32)
    if radius > 0:
        m[:radius, :] = 0.0
        m[nrows - radius:, :] = 0.0
    return m


def _conv1d(img: jax.Array, taps: np.ndarray, axis: int) -> jax.Array:
    """Single-axis convolution of a [..., H, W] image with reversed taps."""
    width = len(taps)
    radius = width // 2
    rev = jnp.asarray(np.ascontiguousarray(taps[::-1]), dtype=jnp.float32)
    if axis == 1:  # horizontal
        rhs = rev.reshape(1, 1, 1, width)
        pad = [(0, 0), (radius, radius)]
    else:  # vertical
        rhs = rev.reshape(1, 1, width, 1)
        pad = [(radius, radius), (0, 0)]
    lead = img.shape[:-2]
    h, w = img.shape[-2], img.shape[-1]
    lhs = img.reshape((-1, 1, h, w))
    # HIGHEST precision keeps the multiplies in true f32 — the default
    # TPU conv path would round operands to bf16, blowing the sub-pixel
    # accuracy contract.
    out = lax.conv_general_dilated(
        lhs, rhs, window_strides=(1, 1), padding=pad,
        preferred_element_type=jnp.float32,
        precision=lax.Precision.HIGHEST)
    return out.reshape(lead + (h, w))


def convolve_separable(img: jax.Array, horiz_taps: np.ndarray,
                       vert_taps: np.ndarray) -> jax.Array:
    """Horizontal pass then vertical pass with zeroed borders.

    Matches _convolveSeparate (src/V1/convolve.c:249-266): the vertical
    pass reads the horizontally-convolved (and border-zeroed) intermediate.
    """
    h, w = img.shape[-2], img.shape[-1]
    hr = len(horiz_taps) // 2
    vr = len(vert_taps) // 2

    tmp = _conv1d(img, horiz_taps, axis=1)
    tmp = tmp * jnp.asarray(_col_mask(w, hr))
    out = _conv1d(tmp, vert_taps, axis=0)
    out = out * jnp.asarray(_row_mask(h, vr))
    return out


def compute_smoothed_image(img: jax.Array, sigma: float) -> jax.Array:
    """Gaussian smooth (reference: _KLTComputeSmoothedImage,
    src/V1/convolve.c:300-314)."""
    from ..kernels import gaussian_kernels
    gauss, _ = gaussian_kernels(sigma)
    return convolve_separable(img, gauss, gauss)


def compute_gradients(img: jax.Array, sigma: float) -> tuple[jax.Array,
                                                             jax.Array]:
    """(gradx, grady) via derivative-of-Gaussian (reference:
    _KLTComputeGradients, src/V1/convolve.c:273-293)."""
    from ..kernels import gaussian_kernels
    gauss, deriv = gaussian_kernels(sigma)
    gradx = convolve_separable(img, deriv, gauss)
    grady = convolve_separable(img, gauss, deriv)
    return gradx, grady
