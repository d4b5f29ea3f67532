"""Batched bilinear interpolation / window sampling.

The reference interpolates one scalar at a time (_interpolate,
src/V1/trackFeatures.c:31-57, 23% of CPU time at 2M calls).  Here all N
features sample their whole window in one vectorized gather: coordinates
are truncated toward zero (C `(int)` cast — coordinates are guaranteed
non-negative by the tracker's bounds checks), the four neighbors are
gathered, and the bilinear blend runs on the VPU.

Boundary semantics: the CPU reference *asserts* in-bounds; the three GPU
versions disagree (clamp / return 0).  We adopt clamped indexing, which is
exact for every in-bounds access and merely keeps masked-out (dead) lanes
finite — the batched analogue of the CPU assert contract.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def window_offsets(width: int, height: int) -> tuple[np.ndarray, np.ndarray]:
    """Integer window offsets (dx, dy), row-major like the reference's
    `for j ... for i ...` window walks — each [height*width]."""
    hw, hh = width // 2, height // 2
    dy, dx = np.mgrid[-hh:hh + 1, -hw:hw + 1]
    return dx.ravel().astype(np.float32), dy.ravel().astype(np.float32)


def bilinear_sample(img: jax.Array, x: jax.Array, y: jax.Array) -> jax.Array:
    """Sample img[y, x] bilinearly for arbitrary-shaped coordinate arrays.

    img: [H, W] float32; x, y: f32 arrays (same shape); returns same shape.
    """
    h, w = img.shape[-2], img.shape[-1]
    xt = x.astype(jnp.int32)  # trunc toward zero; in-bounds coords are >= 0
    yt = y.astype(jnp.int32)
    ax = x - xt.astype(jnp.float32)
    ay = y - yt.astype(jnp.float32)

    x0 = jnp.clip(xt, 0, w - 2)
    y0 = jnp.clip(yt, 0, h - 2)

    p00 = img[..., y0, x0]
    p01 = img[..., y0, x0 + 1]
    p10 = img[..., y0 + 1, x0]
    p11 = img[..., y0 + 1, x0 + 1]

    return ((1 - ax) * (1 - ay) * p00 + ax * (1 - ay) * p01 +
            (1 - ax) * ay * p10 + ax * ay * p11)


def sample_windows(img: jax.Array, x: jax.Array, y: jax.Array,
                   dx: jax.Array, dy: jax.Array) -> jax.Array:
    """Window samples around each feature center.

    img [H,W]; x,y [N]; dx,dy [K] -> [N,K] bilinear samples at
    (x+dx, y+dy), the batched form of the reference's per-feature window
    walks (src/V1/trackFeatures.c:68-123).
    """
    xs = x[:, None] + dx[None, :]
    ys = y[:, None] + dy[None, :]
    return bilinear_sample(img, xs, ys)
