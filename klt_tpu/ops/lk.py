"""Batched pyramidal Lucas-Kanade tracking.

TPU-first re-design of the reference's per-feature Newton loops
(_trackFeature src/V1/trackFeatures.c:381-486, driver
KLTTrackFeatures :1234-1529): all N features advance together as dense
[N]-shaped arrays through a fixed-trip-count iteration loop with
per-feature active masks — masked lanes compute but don't update, which is
the TPU-correct replacement for the C code's data-dependent `break`s.

Semantics preserved exactly:
* the do/while runs >= 1 iteration and <= max_iterations updates;
* OOB is checked (with the 1.001 epsilon margin) before every update and
  once more after the loop, and overrides any other status;
* SMALL_DET aborts before the update; convergence is |dx|<th AND |dy|<th;
* MAX_ITERATIONS is reported whenever the update budget was exhausted,
  even if the last step converged (src/V1/trackFeatures.c:483);
* SMALL_DET / OOB at a coarse level aborts the remaining levels and — like
  the C break — leaves the output coordinates at that level's scale for
  the final border classification (src/V1/trackFeatures.c:1378-1394);
* the lighting-insensitive variant replicates the reference's two distinct
  gain estimates (sqrt of mean-square ratio for the difference window,
  sqrt of mean ratio for the gradient window — src/V1/trackFeatures.c:
  133-220, including the mislabeled accumulators).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..config import (TrackingConfig, TRACKED, SMALL_DET, MAX_ITERATIONS,
                      OOB, LARGE_RESIDUE)
from .interp import window_offsets, sample_windows

_EPS = np.float32(1.001)  # rounding-error margin (src/V1/trackFeatures.c:409)


def _window_oob(x, y, hw, hh, nc, nr):
    """Window-out-of-bounds test, f32 arithmetic like the reference."""
    return ((x - hw < 0.0) | (nc - (x + hw) < _EPS) |
            (y - hh < 0.0) | (nr - (y + hh) < _EPS))


def _gain_bias_diff(g1, g2, area):
    """Gain/bias-normalized intensity difference
    (src/V1/trackFeatures.c:133-169)."""
    mean1 = jnp.sum(g1 * g1, axis=1) / area
    mean2 = jnp.sum(g2 * g2, axis=1) / area
    alpha = jnp.sqrt(mean1 / mean2)
    m1 = jnp.sum(g1, axis=1) / area
    m2 = jnp.sum(g2, axis=1) / area
    beta = m1 - alpha * m2
    return g1 - g2 * alpha[:, None] - beta[:, None]


def _gain_grad_sum(gx1w, gy1w, gx2w, gy2w, g1, g2, area):
    """Gain-normalized gradient sum.  The reference estimates this gain
    from plain-intensity means (src/V1/trackFeatures.c:180-220 — its
    accumulators are misnamed *_squared but sum raw values); replicated
    for bit-level behavioural parity."""
    mean1 = jnp.sum(g1, axis=1) / area
    mean2 = jnp.sum(g2, axis=1) / area
    alpha = jnp.sqrt(mean1 / mean2)[:, None]
    return gx1w + gx2w * alpha, gy1w + gy2w * alpha


def track_level(img1, gradx1, grady1, img2, gradx2, grady2,
                x1, y1, x2, y2, active, cfg: TrackingConfig):
    """One pyramid level of batched LK.

    Returns (x2_out, y2_out, status, iters).  Lanes with active=False pass
    through untouched with status TRACKED.
    """
    w, h = cfg.window_width, cfg.window_height
    hw, hh = np.float32(w // 2), np.float32(h // 2)
    nr, nc = img1.shape
    ncf, nrf = np.float32(nc), np.float32(nr)
    area = np.float32(w * h)
    th = np.float32(cfg.min_displacement)
    step = np.float32(cfg.step_factor)
    min_det = np.float32(cfg.min_determinant)

    dxo, dyo = window_offsets(w, h)
    dxo, dyo = jnp.asarray(dxo), jnp.asarray(dyo)

    # First-image windows are iteration-invariant: sample once.
    g1 = sample_windows(img1, x1, y1, dxo, dyo)
    gx1w = sample_windows(gradx1, x1, y1, dxo, dyo)
    gy1w = sample_windows(grady1, x1, y1, dxo, dyo)

    status0 = jnp.full(x2.shape, TRACKED, jnp.int32)
    iters0 = jnp.zeros(x2.shape, jnp.int32)
    done0 = ~active

    def body(_, state):
        x2c, y2c, status, iters, done = state

        oob = (_window_oob(x1, y1, hw, hh, ncf, nrf) |
               _window_oob(x2c, y2c, hw, hh, ncf, nrf))
        status = jnp.where(~done & oob, OOB, status)
        done = done | oob

        g2 = sample_windows(img2, x2c, y2c, dxo, dyo)
        gx2w = sample_windows(gradx2, x2c, y2c, dxo, dyo)
        gy2w = sample_windows(grady2, x2c, y2c, dxo, dyo)

        if cfg.lighting_insensitive:
            diff = _gain_bias_diff(g1, g2, area)
            gradx, grady = _gain_grad_sum(gx1w, gy1w, gx2w, gy2w,
                                          g1, g2, area)
        else:
            diff = g1 - g2
            gradx = gx1w + gx2w
            grady = gy1w + gy2w

        gxx = jnp.sum(gradx * gradx, axis=1)
        gxy = jnp.sum(gradx * grady, axis=1)
        gyy = jnp.sum(grady * grady, axis=1)
        ex = jnp.sum(diff * gradx, axis=1) * step
        ey = jnp.sum(diff * grady, axis=1) * step

        det = gxx * gyy - gxy * gxy
        small = det < min_det
        status = jnp.where(~done & small, SMALL_DET, status)
        done = done | small

        det_safe = jnp.where(small, jnp.float32(1.0), det)
        dx = (gyy * ex - gxy * ey) / det_safe
        dy = (gxx * ey - gxy * ex) / det_safe

        upd = ~done
        x2c = x2c + jnp.where(upd, dx, 0.0)
        y2c = y2c + jnp.where(upd, dy, 0.0)
        iters = iters + upd.astype(jnp.int32)
        converged = (jnp.abs(dx) < th) & (jnp.abs(dy) < th)
        done = done | (upd & converged)
        return x2c, y2c, status, iters, done

    x2f, y2f, status, iters, _ = jax.lax.fori_loop(
        0, cfg.max_iterations, body, (x2, y2, status0, iters0, done0))

    # Post-loop checks (src/V1/trackFeatures.c:459-484).
    final_oob = _window_oob(x2f, y2f, hw, hh, ncf, nrf)
    status = jnp.where(final_oob, OOB, status)

    g2 = sample_windows(img2, x2f, y2f, dxo, dyo)
    if cfg.lighting_insensitive:
        diff = _gain_bias_diff(g1, g2, area)
    else:
        diff = g1 - g2
    residue = jnp.sum(jnp.abs(diff), axis=1) / area
    status = jnp.where((status == TRACKED) &
                       (residue > np.float32(cfg.max_residue)),
                       LARGE_RESIDUE, status)
    status = jnp.where((status == TRACKED) & (iters >= cfg.max_iterations),
                       MAX_ITERATIONS, status)

    x2f = jnp.where(active, x2f, x2)
    y2f = jnp.where(active, y2f, y2)
    status = jnp.where(active, status, TRACKED)
    return x2f, y2f, status, iters


def track_features_pyramid(pyr1, gradx1, grady1, pyr2, gradx2, grady2,
                           x, y, val, cfg: TrackingConfig):
    """Coarse-to-fine tracking of all features between two pyramids.

    pyr*/grad* are finest-first lists of [H_l, W_l] f32 images.  x, y are
    f32[N] positions in frame 1; val i32[N] (lost features val<0 are
    skipped).  Returns (x_new, y_new, val_new) with the reference's
    classification (src/V1/trackFeatures.c:1343-1437): lost features get
    x = y = -1 and the failure code.
    """
    s = np.float32(cfg.subsampling)
    nlev = cfg.n_pyramid_levels
    nr0, nc0 = pyr1[0].shape
    alive = val >= 0

    xloc, yloc = x, y
    for _ in range(nlev):
        xloc = xloc / s
        yloc = yloc / s
    xout, yout = xloc, yloc

    aborted = jnp.zeros_like(alive)
    last_status = jnp.full(x.shape, TRACKED, jnp.int32)

    for r in range(nlev - 1, -1, -1):
        in_loop = alive & ~aborted  # lanes still in the C level loop
        xloc = jnp.where(in_loop, xloc * s, xloc)
        yloc = jnp.where(in_loop, yloc * s, yloc)
        xout = jnp.where(in_loop, xout * s, xout)
        yout = jnp.where(in_loop, yout * s, yout)

        x2, y2, st, _ = track_level(
            pyr1[r], gradx1[r], grady1[r], pyr2[r], gradx2[r], grady2[r],
            xloc, yloc, xout, yout, in_loop, cfg)

        xout = jnp.where(in_loop, x2, xout)
        yout = jnp.where(in_loop, y2, yout)
        last_status = jnp.where(in_loop, st, last_status)
        aborted = aborted | (in_loop & ((st == SMALL_DET) | (st == OOB)))

    # Final classification (src/V1/trackFeatures.c:1382-1437): a feature
    # that lands outside the border margin is recorded as OOB even if its
    # level status was something else.
    bx = np.float32(cfg.borderx)
    by = np.float32(cfg.bordery)
    out_of_border = ((xout < bx) | (xout > np.float32(nc0 - 1) - bx) |
                     (yout < by) | (yout > np.float32(nr0 - 1) - by))
    final = jnp.where((last_status != OOB) & out_of_border, OOB, last_status)

    lost = final != TRACKED
    x_new = jnp.where(alive, jnp.where(lost, jnp.float32(-1.0), xout), x)
    y_new = jnp.where(alive, jnp.where(lost, jnp.float32(-1.0), yout), y)
    val_new = jnp.where(alive, final, val)
    return x_new, y_new, val_new
