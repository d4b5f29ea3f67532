"""Batched pyramidal Lucas-Kanade tracking.

TPU-first re-design of the reference's per-feature Newton loops
(_trackFeature src/V1/trackFeatures.c:381-486, driver
KLTTrackFeatures :1234-1529): all N features advance together as dense
[N]-shaped arrays through a masked iteration loop — masked lanes compute
but don't update, which is the TPU-correct replacement for the C code's
data-dependent `break`s.

Hot-path layout (the V3-CUDA analogue, re-thought for the MXU):
* per level, each feature gets a VMEM-resident patch of the second image
  stack (intensity + gradients) extracted ONCE via one-hot matmuls
  (interp.onehot_extract_packed) — TPU gathers serialize on the scalar
  core and are avoided entirely;
* on TPU, the ENTIRE masked Newton iteration loop of a level runs as one
  Pallas kernel on those patches (_track_level_kernel ->
  pallas/lk.py) — this removes the ~34 us/iteration of XLA op overhead
  that dominates a while_loop formulation;
* the pure-XLA patch-resident path below (track_level's tail) is the
  semantic oracle and non-TPU fallback: per-iteration window selection
  via bilinear-weighted one-hot matmuls (interp.select_windows_bilinear);
* first-image windows are sampled once per level (the C code recomputes
  them every iteration — same values);
* iteration loops exit as soon as every feature has converged or died,
  recovering the reference's per-feature early exit in aggregate;
* a feature that moves beyond its patch margin stalls (no update) and
  the level re-anchors: patches are re-extracted at the current
  positions and the stalled iteration is redone with exact samples —
  so any displacement is handled without a gather, and the extra
  extraction only happens on the rare frames where a feature jumps
  more than the margin in one Newton step.

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
  gain estimates (src/V1/trackFeatures.c:133-220, including the
  mislabeled accumulators).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..config import (TrackingConfig, TRACKED, SMALL_DET, MAX_ITERATIONS,
                      OOB, LARGE_RESIDUE)
from .interp import (sample_stack_windows, onehot_extract,
                     select_windows_bilinear)

_EPS = np.float32(1.001)  # rounding-error margin (src/V1/trackFeatures.c:409)
PATCH_SIZE = 32           # per-feature resident patch side (f32 tile-friendly)


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
    for behavioural parity."""
    mean1 = jnp.sum(g1, axis=1) / area
    mean2 = jnp.sum(g2, axis=1) / area
    alpha = jnp.sqrt(mean1 / mean2)[:, None]
    return gx1w + gx2w * alpha, gy1w + gy2w * alpha


def _newton_step(g1, gx1w, gy1w, g2, gx2w, gy2w, cfg: TrackingConfig):
    """One 2x2 normal-equation solve from sampled windows.

    Returns (dx, dy, small) — reference: _compute2by2GradientMatrix /
    _compute2by1ErrorVector / _solveEquation
    (src/V1/trackFeatures.c:227-307)."""
    area = np.float32(cfg.window_width * cfg.window_height)
    if cfg.lighting_insensitive:
        diff = _gain_bias_diff(g1, g2, area)
        gradx, grady = _gain_grad_sum(gx1w, gy1w, gx2w, gy2w, g1, g2, area)
    else:
        diff = g1 - g2
        gradx = gx1w + gx2w
        grady = gy1w + gy2w

    gxx = jnp.sum(gradx * gradx, axis=1)
    gxy = jnp.sum(gradx * grady, axis=1)
    gyy = jnp.sum(grady * grady, axis=1)
    step = np.float32(cfg.step_factor)
    ex = jnp.sum(diff * gradx, axis=1) * step
    ey = jnp.sum(diff * grady, axis=1) * step

    det = gxx * gyy - gxy * gxy
    small = det < np.float32(cfg.min_determinant)
    det_safe = jnp.where(small, jnp.float32(1.0), det)
    dx = (gyy * ex - gxy * ey) / det_safe
    dy = (gxx * ey - gxy * ex) / det_safe
    return dx, dy, small


def _final_status(status, iters, x2f, y2f, residue, hw, hh, ncf, nrf,
                  cfg: TrackingConfig):
    """Post-loop checks (src/V1/trackFeatures.c:459-484)."""
    final_oob = _window_oob(x2f, y2f, hw, hh, ncf, nrf)
    status = jnp.where(final_oob, OOB, status)
    status = jnp.where((status == TRACKED) &
                       (residue > np.float32(cfg.max_residue)),
                       LARGE_RESIDUE, status)
    status = jnp.where((status == TRACKED) & (iters >= cfg.max_iterations),
                       MAX_ITERATIONS, status)
    return status


def _track_level_gather(stack1, stack2, x1, y1, x2, y2, active,
                        cfg: TrackingConfig):
    """Reference implementation of one level: per-iteration window
    gathers.  Handles arbitrary displacements; used as the fallback when
    the patch-resident fast path overflows, and as the test oracle."""
    w, h = cfg.window_width, cfg.window_height
    hw, hh = np.float32(w // 2), np.float32(h // 2)
    nr, nc = stack1.shape[-2], stack1.shape[-1]
    ncf, nrf = np.float32(nc), np.float32(nr)
    th = np.float32(cfg.min_displacement)

    g1, gx1w, gy1w = sample_stack_windows(stack1, x1, y1, w, h)
    oob1 = _window_oob(x1, y1, hw, hh, ncf, nrf)

    status0 = jnp.full(x2.shape, TRACKED, jnp.int32)
    iters0 = jnp.zeros(x2.shape, jnp.int32)

    def iterate(state):
        k, x2c, y2c, status, iters, done = state
        oob = oob1 | _window_oob(x2c, y2c, hw, hh, ncf, nrf)
        status = jnp.where(~done & oob, OOB, status)
        done = done | oob

        g2, gx2w, gy2w = sample_stack_windows(stack2, x2c, y2c, w, h)
        dx, dy, small = _newton_step(g1, gx1w, gy1w, g2, gx2w, gy2w, cfg)
        status = jnp.where(~done & small, SMALL_DET, status)
        done = done | small

        upd = ~done
        x2c = x2c + jnp.where(upd, dx, 0.0)
        y2c = y2c + jnp.where(upd, dy, 0.0)
        iters = iters + upd.astype(jnp.int32)
        done = done | (upd & (jnp.abs(dx) < th) & (jnp.abs(dy) < th))
        return k + 1, x2c, y2c, status, iters, done

    def keep_going(state):
        k, _, _, _, _, done = state
        return (k < cfg.max_iterations) & jnp.any(~done)

    _, x2f, y2f, status, iters, _ = jax.lax.while_loop(
        keep_going, iterate,
        (jnp.int32(0), x2, y2, status0, iters0, ~active))

    g2, _, _ = sample_stack_windows(stack2, x2f, y2f, w, h)
    if cfg.lighting_insensitive:
        diff = _gain_bias_diff(g1, g2, np.float32(w * h))
    else:
        diff = g1 - g2
    residue = jnp.sum(jnp.abs(diff), axis=1) / np.float32(w * h)
    status = _final_status(status, iters, x2f, y2f, residue, hw, hh,
                           ncf, nrf, cfg)

    x2f = jnp.where(active, x2f, x2)
    y2f = jnp.where(active, y2f, y2)
    status = jnp.where(active, status, TRACKED)
    return x2f, y2f, status, iters


KERNEL_PATCH = 16  # patch side for the Pallas level kernel


def _kernel_patch_size(nr: int, nc: int, cfg: TrackingConfig) -> int:
    """Patch side.  16 won the margin-vs-selection-cost tradeoff on the
    benchmark sequences: a 12-px patch (2-px margin) shaves ~1 us per
    Newton iteration but triggers enough extra re-anchor rounds (one
    extraction + kernel launch each) to lose ~15% end to end."""
    return max(KERNEL_PATCH,
               max(cfg.window_width, cfg.window_height) + 3)


def _p2_rows(k: int, h: int) -> int:
    """Extracted rows of the p2 canvas (KLT_TPU_P2_ROWS; 0 = full k).

    The canvas stays k x k lanes for the kernel, but extraction fills
    only the first nyk rows (extract_flat* zero-pads the rest) and the
    kernel's y re-anchor bound tightens to nyk-(h+1) — extraction row
    MACs and band bytes scale by nyk/k, while lanes that move past the
    shorter margin stall into the (compacted) tail rounds bit-exactly.
    MEASURED LOSER (round 4, tools/bench_knobs.py, B=16 flagship with
    drained warmups): rows 10/12/14 -> 6049/5280/5881 agg fps vs 6989
    baseline — the extra re-anchor rounds cost more than the narrower
    extraction saves.  Default off; kept reproducible."""
    import os
    v = int(os.environ.get("KLT_TPU_P2_ROWS", "0"))
    if v <= 0:
        return k
    return min(k, max(h + 2, v))


def _pack_patches(p):
    """[F, C, ny, nx] -> [F, ny, C*nx] channel-block lane packing."""
    f, c, ny, nx = p.shape
    return p.transpose(0, 2, 1, 3).reshape(f, ny, c * nx)


def level_carry_eligible(nr: int, nc: int, cfg: TrackingConfig) -> bool:
    """STATIC predicate: the sequential canvas carry is available for a
    level iff track_level takes the v2 one-hot kernel path there."""
    import os
    from ..pallas import pallas_enabled
    from ..pallas import lk2
    w, h = cfg.window_width, cfg.window_height
    if nr < h + 1 or nc < w + 1 or min(nr, nc) < max(h, w) + 2:
        return False
    k = _kernel_patch_size(nr, nc, cfg)
    return (pallas_enabled() and min(nr, nc) >= k
            and max(h, w) + 3 <= k
            and os.environ.get("KLT_TPU_LK_V1", "0") != "1"
            and os.environ.get("KLT_TPU_EXTRACT", "onehot") == "onehot"
            and os.environ.get("KLT_TPU_MERGED_EXTRACT", "0") != "1"
            and lk2.supported(cfg, k))


def make_carry_init(n: int, k: int):
    """Initial canvas-carry triple for one eligible level: zero canvas
    + anchors far out of range, so the first step's validity check
    fails and falls back to extraction.  Shared by the single-sequence
    (runtime/pipeline._init_level_carries) and batched
    (parallel/batched_lk._track_sequences_batched) drivers — the
    anchor sentinel and canvas layout must stay in sync with the
    carry validity check in _track_level_kernel."""
    import jax.numpy as jnp
    return (jnp.zeros((n, 3 * k * k), jnp.float32),
            jnp.full((n,), jnp.int32(-(10 ** 6))),
            jnp.full((n,), jnp.int32(-(10 ** 6))))


def _tail_compact_enabled(n: int, use_v2: bool) -> bool:
    """STATIC predicate: stall-compacted tail rounds are on (v2 kernel,
    enough lanes that a 128-wide tail is a real shrink, env not off)."""
    import os
    _tc_min = int(os.environ.get("KLT_TPU_STALL_COMPACT_MIN",
                                 str(4 * 128)))
    return (use_v2 and n >= _tc_min and
            os.environ.get("KLT_TPU_STALL_COMPACT", "1") == "1")


def _first_round_iter_cap(tail_compact: bool) -> int:
    """KLT_TPU_ITER_CAP=J caps the FIRST (full-width) kernel launch at
    J Newton iterations per level; not-done lanes exit like a stall
    and finish in the 128-wide compacted tail.  Bit-exact (same
    invariant as re-anchor stalls); only engaged when the compacted
    tail is on.  MEASURED LOSER (round 4, tools/bench_knobs.py, B=16
    flagship): caps 1/2/3/5 -> 5054/5041/6306/6944 agg fps vs 6989
    baseline — the extra tail dispatches cost more than the shortened
    full-width launch saves.  Default off; kept reproducible.
    Combining with KLT_TPU_P2_ROWS is refused: the cap's forced stall
    interacts with the short canvas's tightened re-anchor bound
    (measured bit-exactness break at cap=1, rows=10)."""
    import os
    if int(os.environ.get("KLT_TPU_P2_ROWS", "0")) > 0:
        return 0
    cap = int(os.environ.get("KLT_TPU_ITER_CAP", "0"))
    return cap if tail_compact else 0


def _carry_p1_select(cv, o1y, o1x, ok, active, extract_rows,
                     extract_full, o1_zero, n, m=128):
    """p1 window source under the sequential canvas carry — bit-exact
    three-way select (the sampled window is identical image data in
    every arm):

      no bad lanes  -> carried canvas + per-lane offsets (free);
      <= m bad      -> refresh ONLY the bad lanes (m-wide extraction
                       scattered into the carried canvas; refreshed
                       lanes sample at offset 0, carried lanes keep
                       their offsets) — this is what keeps the carry
                       alive under per-frame replacement, where a
                       handful of stale lanes used to force a
                       full-width extraction for everyone;
      otherwise     -> full-width extraction at offset 0.

    extract_rows(idx [m]) -> [m, L] fresh windows for gathered lanes;
    extract_full() -> [n, L].  KLT_TPU_CARRY_REFRESH=0 restores the
    all-or-nothing behavior (keyed via pallas_key)."""
    import os
    o1_carried = jnp.stack([o1y, o1x], axis=1)
    bad = active & ~ok
    cnt = jnp.sum(bad.astype(jnp.int32))
    use_partial = (n > m and
                   os.environ.get("KLT_TPU_CARRY_REFRESH", "1") == "1")
    if not use_partial:
        return jax.lax.cond(
            cnt == 0,
            lambda: (cv, o1_carried),
            lambda: (extract_full(), o1_zero))

    def partial_fn():
        slots = jnp.cumsum(bad.astype(jnp.int32)) - 1
        tgt = jnp.where(bad, slots, m)
        idx = jnp.zeros((m,), jnp.int32).at[tgt].set(
            jnp.arange(n, dtype=jnp.int32), mode="drop")
        pad = jnp.arange(m, dtype=jnp.int32) >= cnt
        fresh = extract_rows(idx)
        sidx = jnp.where(pad, n, idx)
        p1 = cv.at[sidx].set(fresh, mode="drop")
        oc = jnp.where(bad[:, None], 0, o1_carried)
        return p1, oc

    return jax.lax.cond(
        cnt == 0,
        lambda: (cv, o1_carried),
        lambda: jax.lax.cond(cnt <= m, partial_fn,
                             lambda: (extract_full(), o1_zero)))


def _run_reanchor_tail(first_state, round_once, tail_extract, anchors,
                       p1w, ax1c, ay1c, oob1_i, o1_cols, inner,
                       n, k, nc, nr, cfg, use_v2, tail_compact):
    """Shared re-anchor machinery for the single-sequence and batched
    kernel drivers (_track_level_kernel here and
    parallel/batched_lk._track_level_kernel_batched): the optional
    straight-line / cond-gated unrolled rounds, then the while_loop
    tail with stall-compaction.

    first_state: the 9-tuple a round produces —
      (x2, y2, status, iters, done, residue, p2_last, py0_last,
       px0_last), all over n flat lanes.
    round_once(x2, y2, status, iters, done) -> that same 9-tuple.
    tail_extract(py0, px0, idx) -> [M_TAIL, 3*k*k] p2 patches for the
      gathered lanes, through the SAME backend/layout round_once uses
      (idx carries the source lane for batched flat-row addressing).
    anchors(x2, y2) -> (py0, px0), elementwise on flat lanes.

    Stall-compaction is bit-exact: a lane's trajectory is independent
    of its canvas anchor (the sampled window is identical image data)
    and of its block's other lanes (all kernel ops are lane-masked).
    """
    import os
    st = first_state
    if os.environ.get("KLT_TPU_COND_REANCHOR", "0") == "1":
        # cond-gate the unrolled rounds: when no lane stalled, the
        # round is a no-op whose extraction cost can be skipped
        # entirely (bit-exact: a no-op round only refreshes the canvas
        # anchor, and the canvas holds exact image content either way)
        def _ro(s):
            return round_once(s[0], s[1], s[2], s[3], s[4])

        for _ in range(cfg.reanchor_unroll):
            st = jax.lax.cond(jnp.any(st[4] == 0), _ro, lambda s: s,
                              st)
    else:
        for _ in range(cfg.reanchor_unroll):
            st = round_once(st[0], st[1], st[2], st[3], st[4])

    # Stall-compaction for the re-anchor tail: tail rounds re-extract
    # and re-launch at full width for a handful of stalled lanes;
    # gather them into an M-wide state instead.
    M_TAIL = 128

    def outer(state):
        rounds, x2c, y2c, status, iters, done = state[:6]
        residue_c, p2l_c, py0l_c, px0l_c = state[6:]
        if not tail_compact:
            out = round_once(x2c, y2c, status, iters, done)
            return (rounds + 1,) + out

        act = done == 0
        cnt = jnp.sum(act.astype(jnp.int32))

        def full_round(_):
            return round_once(x2c, y2c, status, iters, done)

        def compact_round(_):
            slots = jnp.cumsum(act.astype(jnp.int32)) - 1
            tgt = jnp.where(act, slots, M_TAIL)
            idx = jnp.zeros((M_TAIL,), jnp.int32).at[tgt].set(
                jnp.arange(n, dtype=jnp.int32), mode="drop")
            pad = jnp.arange(M_TAIL, dtype=jnp.int32) >= cnt
            g = lambda a: jnp.take(a, idx, axis=0)
            x2g, y2g = g(x2c), g(y2c)
            dng = jnp.where(pad, 1, g(done))
            py0, px0 = anchors(x2g, y2g)
            p2 = tail_extract(py0, px0, idx)
            fst = jnp.concatenate(
                [x2g[:, None], y2g[:, None], g(ax1c), g(ay1c),
                 px0.astype(jnp.float32)[:, None],
                 py0.astype(jnp.float32)[:, None]], axis=1)
            ist = jnp.concatenate(
                [g(status)[:, None], g(iters)[:, None], dng[:, None],
                 g(oob1_i), g(o1_cols)], axis=1)
            fo, io, rs = inner(g(p1w), p2, fst, ist, cfg, k, nc, nr)
            sidx = jnp.where(pad, n, idx)
            sc = lambda full, v: full.at[sidx].set(v, mode="drop")
            return (sc(x2c, fo[:, 0]), sc(y2c, fo[:, 1]),
                    sc(status, io[:, 0]), sc(iters, io[:, 1]),
                    sc(done, io[:, 2]), sc(residue_c, rs),
                    sc(p2l_c, p2), sc(py0l_c, py0), sc(px0l_c, px0))

        out = jax.lax.cond(cnt <= M_TAIL, compact_round, full_round,
                           None)
        return (rounds + 1,) + out

    def outer_going(state):
        rounds, done = state[0], state[5]
        return jnp.any(done == 0) & (rounds < cfg.max_iterations + 1)

    return jax.lax.while_loop(outer_going, outer,
                              (jnp.int32(0),) + tuple(st))[1:]


def _track_level_kernel(stack1, stack2, x1, y1, x2, y2, active,
                        cfg: TrackingConfig, carry_in=None,
                        want_carry=False, stale=None,
                        want_residue=True):
    """track_level with the whole Newton loop in one Pallas kernel per
    anchor round (klt_tpu/pallas/lk.py).  Semantics mirror the fast
    path below; the outer re-anchor loop stays in XLA.

    carry_in/want_carry: sequential-mode canvas carry (see
    parallel/batched_lk._track_level_kernel_batched — same contract):
    carry_in = (canvas [F, 3k^2], qy0 [F], qx0 [F]) from the previous
    step's last re-anchor round; `stale` bool [F] marks features whose
    carried canvas must not be trusted (freshly replaced/selected —
    their slot held a different feature when the canvas was written).
    """
    import os
    from ..pallas.lk import lk_level_inner
    from .interp import (pack_stack_channels, extract_packed_cb,
                         extract_flat)

    w, h = cfg.window_width, cfg.window_height
    hw, hh = np.float32(w // 2), np.float32(h // 2)
    hwi, hhi = w // 2, h // 2
    nr, nc = stack1.shape[-2], stack1.shape[-1]
    k = _kernel_patch_size(nr, nc, cfg)
    ncf, nrf = np.float32(nc), np.float32(nr)
    margin_x = (k - (w + 1)) // 2
    n = x1.shape[0]

    col = lambda v: v[:, None]  # [F] -> [F, 1]

    # channel-packed level images: one relayout each, shared by every
    # extraction round below (extraction then emits the kernel operand
    # layout directly — no per-round relayouts)
    sp1 = pack_stack_channels(stack1)
    sp2 = pack_stack_channels(stack2)

    # first-image raw windows (integer corner, fixed for the level)
    xt1 = x1.astype(jnp.int32)
    yt1 = y1.astype(jnp.int32)
    ax1 = x1 - xt1.astype(jnp.float32)
    ay1 = y1 - yt1.astype(jnp.float32)
    x10 = jnp.clip(xt1 - hwi, 0, nc - (w + 1))
    y10 = jnp.clip(yt1 - hhi, 0, nr - (h + 1))
    # v2 (flattened-lane kernel, pallas/lk2.py) vs v1 ([F, K, 3K]
    # kernel).  KLT_TPU_LK_V1=1 forces the v1 path (trace-time; set
    # before first use).
    from ..pallas import lk2
    use_v2 = (os.environ.get("KLT_TPU_LK_V1", "0") != "1"
              and lk2.supported(cfg, k))
    exmode = os.environ.get("KLT_TPU_EXTRACT", "onehot")
    # short p2 canvas (v2 one-hot/ds paths only; the merged-extract
    # knob shares one ny=k extraction between p1 and p2)
    nyk = (_p2_rows(k, h) if use_v2 and
           os.environ.get("KLT_TPU_MERGED_EXTRACT", "0") != "1" else k)
    margin_y = (nyk - (h + 1)) // 2
    if use_v2 and exmode in ("ds", "ds2"):
        # block-gather variants: one vmapped dynamic_slice per image
        # (XLA lowers to a single contiguous-block gather).  "ds2"
        # keeps the gather's NATIVE [F, 3, K, K] order — the kernel is
        # built in channel-major lane layout so the flatten is a free
        # contiguous reshape (no transpose/relayout); "ds" folds onto
        # the row-major canvas via a transpose (measured slower).
        layout = "cr" if exmode == "ds2" else "rc"
        inner = functools.partial(lk2.lk_level_inner_flat,
                                  layout=layout,
                                  want_residue=want_residue,
                                  ny_eff=nyk)

        def _ds_flat(stack, y0, x0, ny, nx):
            # lane count comes from y0 (the stall-compacted tail
            # extracts M_TAIL lanes through this same path)
            out = jax.vmap(lambda ys, xs: jax.lax.dynamic_slice(
                stack, (0, ys, xs), (3, ny, nx)))(y0, x0)
            if ny < k or nx < k:
                out = jnp.pad(out, ((0, 0), (0, 0), (0, k - ny),
                                    (0, k - nx)))
            if exmode == "ds":
                out = out.transpose(0, 2, 1, 3)
            return out.reshape(y0.shape[0], 3 * k * k)

        p1w = _ds_flat(stack1, y10, x10, h + 1, w + 1)
        extract2 = lambda py0, px0: _ds_flat(stack2, py0, px0, nyk, k)
    elif use_v2:
        inner = functools.partial(lk2.lk_level_inner_flat,
                                  want_residue=want_residue,
                                  ny_eff=nyk)
        extract2 = lambda py0, px0: extract_flat(sp2, py0, px0, nyk,
                                                 k, k)
        p1w = None  # set below (possibly merged with round-1 p2)
    else:
        inner = functools.partial(lk_level_inner,
                                  want_residue=want_residue)
        p1w = extract_packed_cb(sp1, y10, x10, h + 1, w + 1)
        extract2 = lambda py0, px0: extract_packed_cb(sp2, py0, px0,
                                                      k, k)
    oob1 = _window_oob(x1, y1, hw, hh, ncf, nrf)

    def anchors(x2c, y2c):
        py0 = jnp.clip(y2c.astype(jnp.int32) - hhi - margin_y, 0,
                       nr - nyk)
        px0 = jnp.clip(x2c.astype(jnp.int32) - hwi - margin_x, 0, nc - k)
        return py0, px0

    status0 = jnp.full(x2.shape, TRACKED, jnp.int32)
    iters0 = jnp.zeros(x2.shape, jnp.int32)
    done0 = (~active).astype(jnp.int32)
    res0 = jnp.zeros((x2.shape[0], 1), jnp.float32)
    oob1_i = col(oob1.astype(jnp.int32))
    ax1c, ay1c = col(ax1), col(ay1)

    o1_zero = jnp.zeros((x2.shape[0], 2), jnp.int32) if use_v2 else None
    if want_carry or carry_in is not None:
        assert use_v2 and p1w is None and \
            os.environ.get("KLT_TPU_MERGED_EXTRACT", "0") != "1", \
            "canvas carry requires the v2 one-hot kernel path"
    p2_first = None
    o1_cols = o1_zero
    if p1w is None:
        # v2 one-hot path: p1w pending.  Optionally MERGE the
        # first-image window extraction with the first round's p2 into
        # one call — the extraction chain's latency is paid once
        # instead of twice per level (KLT_TPU_MERGED_EXTRACT=1).
        if os.environ.get("KLT_TPU_MERGED_EXTRACT", "0") == "1":
            padrows = k - (h + 1)
            spb = jnp.concatenate(
                [sp1, jnp.zeros((padrows, sp1.shape[1]), sp1.dtype),
                 sp2])
            hoff = nr + padrows
            py0_0, px0_0 = anchors(x2, y2)
            cat = extract_flat(
                spb, jnp.concatenate([y10, py0_0 + hoff]),
                jnp.concatenate([x10, px0_0]), k, k, k)
            p1w = cat[:n]
            p2_first = cat[n:]
        elif carry_in is not None:
            cv, qy0p, qx0p = carry_in
            o1y = y10 - qy0p
            o1x = x10 - qx0p
            ok = ((o1y >= 0) & (o1y <= nyk - (h + 1)) &
                  (o1x >= 0) & (o1x <= k - (w + 1)))
            if stale is not None:
                ok = ok & ~stale
            p1w, o1_cols = _carry_p1_select(
                cv, o1y, o1x, ok, active,
                lambda idx: extract_flat(sp1, jnp.take(y10, idx),
                                         jnp.take(x10, idx),
                                         h + 1, w + 1, k),
                lambda: extract_flat(sp1, y10, x10, h + 1, w + 1, k),
                o1_zero, n)
        else:
            p1w = extract_flat(sp1, y10, x10, h + 1, w + 1, k)

    def round_once(x2c, y2c, status, iters, done, p2=None, cap=0):
        py0, px0 = anchors(x2c, y2c)
        if p2 is None:
            p2 = extract2(py0, px0)
        fstate = jnp.concatenate(
            [col(x2c), col(y2c), ax1c, ay1c,
             col(px0.astype(jnp.float32)), col(py0.astype(jnp.float32))],
            axis=1)
        icols = [col(status), col(iters), col(done), oob1_i]
        if use_v2:  # v2 adds the p1-canvas window offset
            icols.append(o1_cols)
        istate = jnp.concatenate(icols, axis=1)
        if cap:  # v2-only static per-launch iteration cap
            fout, iout, resn = inner(p1w, p2, fstate, istate,
                                     cfg, k, nc, nr, iter_cap=cap)
        else:
            fout, iout, resn = inner(p1w, p2, fstate, istate,
                                     cfg, k, nc, nr)
        return (fout[:, 0], fout[:, 1], iout[:, 0], iout[:, 1],
                iout[:, 2], resn, p2, py0, px0)

    # first anchor round always runs; the shared machinery
    # (_run_reanchor_tail) adds cfg.reanchor_unroll optional
    # straight-line rounds and the stall-compacted while_loop tail.
    # Tail extraction goes through the round's own extract2 backend
    # (the ds2 kernel is built channel-major; a hardcoded extract_flat
    # would feed it row-major patches).
    tail_compact = _tail_compact_enabled(n, use_v2)
    first = round_once(x2, y2, status0, iters0, done0, p2=p2_first,
                       cap=_first_round_iter_cap(tail_compact))
    (x2f, y2f, status, iters, done, residue, p2l, py0l,
     px0l) = _run_reanchor_tail(
        first, round_once, lambda py0, px0, idx: extract2(py0, px0),
        anchors, p1w, ax1c, ay1c, oob1_i, o1_cols, inner,
        n, k, nc, nr, cfg, use_v2, tail_compact)
    residue = residue[:, 0]

    status = _final_status(status, iters, x2f, y2f, residue, hw, hh,
                           ncf, nrf, cfg)
    x2f = jnp.where(active, x2f, x2)
    y2f = jnp.where(active, y2f, y2)
    status = jnp.where(active, status, TRACKED)
    if want_carry:
        return (x2f, y2f, status, iters), (p2l, py0l, px0l)
    return x2f, y2f, status, iters


def track_level(stack1, stack2, x1, y1, x2, y2, active,
                cfg: TrackingConfig, carry_in=None, want_carry=False,
                stale=None, want_residue=True):
    """One pyramid level of batched LK — patch-resident fast path.

    stack1/stack2: [3, H, W] f32 (intensity, gradx, grady) of the two
    frames at this level.  Lanes with active=False pass through untouched
    with status TRACKED.  Returns (x2_out, y2_out, status, iters) —
    or ((...), carry_out) with want_carry (callers gate on
    level_carry_eligible).
    """
    w, h = cfg.window_width, cfg.window_height
    nr, nc = stack1.shape[-2], stack1.shape[-1]
    if nr < h + 1 or nc < w + 1:
        # level smaller than the tracking window: every window is
        # out of bounds before the first iteration (the reference's
        # first _window_oob check fails for all positions)
        assert not want_carry
        status = jnp.where(active, jnp.int32(OOB), jnp.int32(TRACKED))
        return x2, y2, status, jnp.zeros_like(status)
    if min(nr, nc) < max(h, w) + 2:
        assert not want_carry
        return _track_level_gather(stack1, stack2, x1, y1, x2, y2,
                                   active, cfg)

    from ..pallas import pallas_enabled
    _k = _kernel_patch_size(nr, nc, cfg)
    if (pallas_enabled() and min(nr, nc) >= _k
            and max(h, w) + 3 <= _k):
        return _track_level_kernel(stack1, stack2, x1, y1, x2, y2,
                                   active, cfg, carry_in=carry_in,
                                   want_carry=want_carry, stale=stale,
                                   want_residue=want_residue)
    assert not want_carry

    hw, hh = np.float32(w // 2), np.float32(h // 2)
    hwi, hhi = w // 2, h // 2
    ncf, nrf = np.float32(nc), np.float32(nr)
    th = np.float32(cfg.min_displacement)
    sy = min(PATCH_SIZE, nr)
    sx = min(PATCH_SIZE, nc)

    # --- first-image windows: sampled once, integer-extract + blend ---
    xt1 = x1.astype(jnp.int32)
    yt1 = y1.astype(jnp.int32)
    ax1 = (x1 - xt1.astype(jnp.float32))[None, :, None]
    ay1 = (y1 - yt1.astype(jnp.float32))[None, :, None]
    x10 = jnp.clip(xt1 - hwi, 0, nc - (w + 1))
    y10 = jnp.clip(yt1 - hhi, 0, nr - (h + 1))
    w1 = onehot_extract(stack1, y10, x10, h + 1, w + 1)  # [F, 3, h+1, w+1]
    p00 = w1[:, :, :-1, :-1]
    p01 = w1[:, :, :-1, 1:]
    p10 = w1[:, :, 1:, :-1]
    p11 = w1[:, :, 1:, 1:]
    f = x1.shape[0]
    w1b = ((1 - ax1) * (1 - ay1) *
           p00.transpose(1, 0, 2, 3).reshape(3, f, h * w) +
           ax1 * (1 - ay1) * p01.transpose(1, 0, 2, 3).reshape(3, f, h * w) +
           (1 - ax1) * ay1 * p10.transpose(1, 0, 2, 3).reshape(3, f, h * w) +
           ax1 * ay1 * p11.transpose(1, 0, 2, 3).reshape(3, f, h * w))
    g1, gx1w, gy1w = w1b
    oob1 = _window_oob(x1, y1, hw, hh, ncf, nrf)

    # --- second-image resident patches, re-anchored on demand ---
    margin_y = (sy - (h + 1)) // 2
    margin_x = (sx - (w + 1)) // 2

    def anchors(x2c, y2c):
        py0 = jnp.clip(y2c.astype(jnp.int32) - hhi - margin_y, 0, nr - sy)
        px0 = jnp.clip(x2c.astype(jnp.int32) - hwi - margin_x, 0, nc - sx)
        return py0, px0

    def local_window(x2c, y2c, py0, px0):
        """Integer corner + fractions of the sampling window in patch
        coordinates, plus the out-of-patch overflow flag."""
        xt = x2c.astype(jnp.int32)
        yt = y2c.astype(jnp.int32)
        ax = x2c - xt.astype(jnp.float32)
        ay = y2c - yt.astype(jnp.float32)
        ox = xt - hwi - px0
        oy = yt - hhi - py0
        ovf = ((ox < 0) | (ox > sx - (w + 1)) |
               (oy < 0) | (oy > sy - (h + 1)))
        ox = jnp.clip(ox, 0, sx - (w + 1))
        oy = jnp.clip(oy, 0, sy - (h + 1))
        return oy, ox, ay, ax, ovf

    status0 = jnp.full(x2.shape, TRACKED, jnp.int32)
    iters0 = jnp.zeros(x2.shape, jnp.int32)

    def inner(state):
        """One Newton iteration; lanes beyond their patch stall so the
        outer loop can re-anchor them with exact samples."""
        x2c, y2c, status, iters, done, py0, px0, patches, _ = state
        oob = oob1 | _window_oob(x2c, y2c, hw, hh, ncf, nrf)
        status = jnp.where(~done & oob, OOB, status)
        done = done | oob

        oy, ox, ay, ax, ovf = local_window(x2c, y2c, py0, px0)
        stall = ~done & ovf
        eff = ~done & ~ovf

        g2, gx2w, gy2w = select_windows_bilinear(patches, oy, ox, ay, ax,
                                                 h, w)
        dx, dy, small = _newton_step(g1, gx1w, gy1w, g2, gx2w, gy2w, cfg)
        status = jnp.where(eff & small, SMALL_DET, status)
        done = done | (eff & small)

        upd = eff & ~small
        x2c = x2c + jnp.where(upd, dx, 0.0)
        y2c = y2c + jnp.where(upd, dy, 0.0)
        iters = iters + upd.astype(jnp.int32)
        converged = (jnp.abs(dx) < th) & (jnp.abs(dy) < th)
        done = done | (upd & (converged | (iters >= cfg.max_iterations)))
        return (x2c, y2c, status, iters, done, py0, px0, patches,
                jnp.any(stall))

    def inner_going(state):
        done, stalled = state[4], state[8]
        return jnp.any(~done) & ~stalled

    def outer(state):
        rounds, x2c, y2c, status, iters, done = state
        py0, px0 = anchors(x2c, y2c)
        patches = onehot_extract(stack2, py0, px0, sy, sx)
        x2c, y2c, status, iters, done, _, _, _, _ = jax.lax.while_loop(
            inner_going, inner,
            (x2c, y2c, status, iters, done, py0, px0, patches,
             jnp.asarray(False)))
        return rounds + 1, x2c, y2c, status, iters, done

    def outer_going(state):
        rounds, done = state[0], state[5]
        # progress is guaranteed: a freshly anchored in-bounds lane can't
        # stall, so rounds is bounded by the stall count
        return jnp.any(~done) & (rounds < cfg.max_iterations + 2)

    _, x2f, y2f, status, iters, _ = jax.lax.while_loop(
        outer_going, outer,
        (jnp.int32(0), x2, y2, status0, iters0, ~active))

    # Residue at the final position, from freshly anchored patches
    # (a lane's last update may land outside its previous patch).
    py0, px0 = anchors(x2f, y2f)
    patches = onehot_extract(stack2, py0, px0, sy, sx)
    oy, ox, ay, ax, _ = local_window(x2f, y2f, py0, px0)
    g2, _, _ = select_windows_bilinear(patches, oy, ox, ay, ax, h, w)
    if cfg.lighting_insensitive:
        diff = _gain_bias_diff(g1, g2, np.float32(w * h))
    else:
        diff = g1 - g2
    residue = jnp.sum(jnp.abs(diff), axis=1) / np.float32(w * h)
    status = _final_status(status, iters, x2f, y2f, residue, hw, hh,
                           ncf, nrf, cfg)

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
    stacks1 = [jnp.stack([p, a, b])
               for p, a, b in zip(pyr1, gradx1, grady1)]
    stacks2 = [jnp.stack([p, a, b])
               for p, a, b in zip(pyr2, gradx2, grady2)]
    return track_features_pyramid_stacks(stacks1, stacks2, x, y, val, cfg)


def track_features_pyramid_stacks(stacks1, stacks2, x, y, val,
                                  cfg: TrackingConfig, carries=None,
                                  want_carry=False):
    """Same driver on finest-first [3, H_l, W_l] stacks (the pyramid
    kernel's native output layout — no re-stacking on the hot path).

    carries/want_carry: per-level sequential canvas carries — one
    (canvas, qy0, qx0) triple per level_carry_eligible level,
    finest-first (see _track_level_kernel).  Freshly selected/replaced
    features are detected via val > 0 (a selection response; tracked
    features carry status 0) and invalidate the step's carry.  With
    want_carry the return grows to (x, y, val, carries_out)."""
    s = np.float32(cfg.subsampling)
    nlev = cfg.n_pyramid_levels
    nr0, nc0 = stacks1[0].shape[-2], stacks1[0].shape[-1]
    alive = val >= 0
    stale = val > 0

    from ..utils.checks import check_in_bounds, check_same_shape
    check_same_shape(stacks1[0], stacks2[0], "frame pair")
    check_in_bounds(jnp.where(alive, x, 0.0), jnp.where(alive, y, 0.0),
                    nc0, nr0, "input feature positions")

    xloc, yloc = x, y
    for _ in range(nlev):
        xloc = xloc / s
        yloc = yloc / s
    xout, yout = xloc, yloc

    aborted = jnp.zeros_like(alive)
    last_status = jnp.full(x.shape, TRACKED, jnp.int32)

    elig = [level_carry_eligible(st1.shape[-2], st1.shape[-1], cfg)
            for st1 in stacks1]
    use_carry = want_carry or carries is not None
    slot = {}
    j = 0
    for r in range(nlev):
        if elig[r]:
            slot[r] = j
            j += 1
    carries_out = [None] * j

    for r in range(nlev - 1, -1, -1):
        in_loop = alive & ~aborted  # lanes still in the C level loop
        xloc = jnp.where(in_loop, xloc * s, xloc)
        yloc = jnp.where(in_loop, yloc * s, yloc)
        xout = jnp.where(in_loop, xout * s, xout)
        yout = jnp.where(in_loop, yout * s, yout)

        if use_carry and elig[r]:
            cin = carries[slot[r]] if carries is not None else None
            (x2, y2, st, _), carries_out[slot[r]] = track_level(
                stacks1[r], stacks2[r], xloc, yloc, xout, yout,
                in_loop, cfg, carry_in=cin, want_carry=True,
                stale=stale, want_residue=(r == 0))
        else:
            x2, y2, st, _ = track_level(stacks1[r], stacks2[r],
                                        xloc, yloc, xout, yout,
                                        in_loop, cfg,
                                        want_residue=(r == 0))

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
    if want_carry:
        return x_new, y_new, val_new, tuple(carries_out)
    return x_new, y_new, val_new
