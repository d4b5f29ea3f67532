"""One-hot patch-extraction formulations must agree bit-for-bit."""

import numpy as np
import jax.numpy as jnp

from klt_tpu.ops.interp import (pack_stack_channels, extract_flat_rows,
                                extract_flat_tiled, extract_flat)


def _mkstack(rng, h, w):
    img = rng.uniform(0, 255, (3, h, w)).astype(np.float32)
    return pack_stack_channels(jnp.asarray(img))


def test_tiled_matches_rows_bit_exact():
    rng = np.random.RandomState(7)
    for h, w, ny, nx, k, st in ((480, 640, 16, 16, 16, 16),
                                (240, 320, 16, 16, 16, 16),
                                (480, 640, 8, 8, 16, 16),
                                (120, 160, 16, 16, 16, 8),
                                (480, 640, 48, 48, 48, 16)):
        sp = _mkstack(rng, h, w)
        f = 97
        x0 = rng.randint(0, w - k + 1, f).astype(np.int32)
        y0 = rng.randint(0, h - ny + 1, f).astype(np.int32)
        # force edge coverage: min/max corners in the set
        x0[:4] = [0, w - k, 0, w - k]
        y0[:4] = [0, 0, h - ny, h - ny]
        a = extract_flat_rows(sp, jnp.asarray(x0 * 0 + y0),
                              jnp.asarray(x0), ny, nx, k)
        b = extract_flat_tiled(sp, jnp.asarray(x0 * 0 + y0),
                               jnp.asarray(x0), ny, nx, k, st=st)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_tiled_degenerate_width_falls_back():
    rng = np.random.RandomState(3)
    sp = _mkstack(rng, 60, 20)  # narrower than one tile
    f = 8
    x0 = jnp.asarray(rng.randint(0, 20 - 16 + 1, f).astype(np.int32))
    y0 = jnp.asarray(rng.randint(0, 60 - 16 + 1, f).astype(np.int32))
    a = extract_flat_rows(sp, y0, x0, 16, 16, 16)
    b = extract_flat_tiled(sp, y0, x0, 16, 16, 16, st=16)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
