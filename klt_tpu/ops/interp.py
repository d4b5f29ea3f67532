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

import os

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


def sample_stack_windows(stack: jax.Array, x: jax.Array, y: jax.Array,
                         width: int, height: int) -> jax.Array:
    """Bilinear (width x height) windows around each center, for C images
    at once, via per-feature patch slicing.

    stack: [C, H, W] f32; x, y: [N] window centers.
    Returns [C, N, height*width] samples at (x+i, y+j) for the row-major
    integer window offsets.

    TPU-first: instead of 4*K element gathers per feature (the batched
    transliteration of the reference's per-pixel _interpolate), each
    feature slices ONE integer-aligned (height+1, width+1) patch — a
    single gather of contiguous blocks — and the bilinear blend runs as
    four shifted multiplies on the VPU.  The fractional weights are
    constant across a window because the offsets are integers.
    """
    c = stack.shape[0]
    h_img, w_img = stack.shape[-2], stack.shape[-1]
    hw, hh = width // 2, height // 2
    xt = x.astype(jnp.int32)
    yt = y.astype(jnp.int32)
    ax = (x - xt.astype(jnp.float32))[:, None, None, None]
    ay = (y - yt.astype(jnp.float32))[:, None, None, None]

    def one(ys, xs):
        # dynamic_slice clamps out-of-range starts, which only masked-out
        # (dead) lanes can produce.
        return jax.lax.dynamic_slice(stack, (0, ys, xs),
                                     (c, height + 1, width + 1))

    p = jax.vmap(one)(yt - hh, xt - hw)  # [N, C, height+1, width+1]
    p00 = p[:, :, :-1, :-1]
    p01 = p[:, :, :-1, 1:]
    p10 = p[:, :, 1:, :-1]
    p11 = p[:, :, 1:, 1:]
    out = ((1 - ax) * (1 - ay) * p00 + ax * (1 - ay) * p01 +
           (1 - ax) * ay * p10 + ax * ay * p11)  # [N, C, h, w]
    n = x.shape[0]
    return out.transpose(1, 0, 2, 3).reshape(c, n, height * width)


def onehot_extract(stack: jax.Array, y0: jax.Array, x0: jax.Array,
                   ny: int, nx: int, chunk: int = 512) -> jax.Array:
    """Integer-aligned patch extraction via one-hot matmuls (MXU path).

    stack: [C, H, W]; y0, x0: int32 [F] top-left corners (assumed
    in-bounds / pre-clipped).  Returns [F, C, ny, nx].

    TPU gathers serialize on the scalar core (~2.5 us per feature); a
    dense one-hot row-selection matmul plus a batched column-selection
    einsum keeps extraction on the MXU.  HIGHEST precision makes the
    0/1-weighted selection exact to ~1 ulp.  Large feature counts are
    chunked to bound the one-hot materialization.
    """
    f = y0.shape[0]
    c, h_img, w_img = stack.shape
    hi = jnp.arange(h_img, dtype=jnp.int32)
    wi = jnp.arange(w_img, dtype=jnp.int32)

    def extract_chunk(y0c, x0c):
        fc = y0c.shape[0]
        rows = (y0c[:, None] +
                jnp.arange(ny, dtype=jnp.int32)[None, :]).reshape(-1)
        row_oh = (rows[:, None] == hi[None, :]).astype(jnp.float32)
        band = jnp.einsum("rh,chw->crw", row_oh, stack,
                          precision=jax.lax.Precision.HIGHEST,
                          preferred_element_type=jnp.float32)
        band = band.reshape(c, fc, ny, w_img)
        col_oh = ((x0c[:, None, None] +
                   jnp.arange(nx, dtype=jnp.int32)[None, :, None]) ==
                  wi[None, None, :]).astype(jnp.float32)  # [fc, nx, W]
        out = jnp.einsum("cfrw,fxw->fcrx", band, col_oh,
                         precision=jax.lax.Precision.HIGHEST,
                         preferred_element_type=jnp.float32)
        return out

    if f <= chunk:
        return extract_chunk(y0, x0)
    pad = (-f) % chunk
    y0p = jnp.pad(y0, (0, pad))
    x0p = jnp.pad(x0, (0, pad))
    n_chunks = (f + pad) // chunk
    outs = jax.lax.map(lambda args: extract_chunk(*args),
                       (y0p.reshape(n_chunks, chunk),
                        x0p.reshape(n_chunks, chunk)))
    return outs.reshape(n_chunks * chunk, c, ny, nx)[:f]


def onehot_extract_packed_rows(stack: jax.Array, y0: jax.Array,
                               x0: jax.Array, ny: int, nx: int) -> jax.Array:
    """Per-row one-hot packed extraction (the round-1 formulation):
    [F*ny, H] row one-hot against the full image.  Kept as the A/B
    reference for the row-block-aligned fast path below; O(F*ny*H*W)
    MXU work makes it the large-F bottleneck."""
    prec = jax.lax.Precision.HIGH
    c, h_img, w_img = stack.shape
    hi = jnp.arange(h_img, dtype=jnp.int32)
    wi = jnp.arange(w_img, dtype=jnp.int32)
    f = y0.shape[0]
    rows = (y0[:, None] +
            jnp.arange(ny, dtype=jnp.int32)[None, :]).reshape(-1)
    row_oh = (rows[:, None] == hi[None, :]).astype(jnp.float32)
    band = jnp.einsum("rh,chw->crw", row_oh, stack, precision=prec,
                      preferred_element_type=jnp.float32)
    band = band.reshape(c, f, ny, w_img)
    col_oh = ((x0[:, None, None] +
               jnp.arange(nx, dtype=jnp.int32)[None, :, None]) ==
              wi[None, None, :]).astype(jnp.float32)  # [f, nx, W]
    out = jnp.einsum("cfrw,fxw->frcx", band, col_oh, precision=prec,
                     preferred_element_type=jnp.float32)
    return out.reshape(f, ny, c * nx)


_ROW_BLOCK = 8  # aligned row-block size for the blocked extraction
_ROWS_MIN_F = 512  # feature count from which the exact-row (unblocked)
#                    extraction formulation wins (tools/bench_extract2)


def _extract_mm():
    """(matmul precision, band dtype) for the hot-path extraction.

    KLT_TPU_EXTRACT_PREC (trace-time, keyed via pallas_key):
      'high' (default) — bf16x3 one-hot matmuls, f32 band: selection
        exact to the data's low mantissa bits;
      'bf16' — single-pass MXU + bf16 band materialization.  The
        extraction is HBM/materialization-bound (roofline r3: 112% of
        the byte model), so halving the band bytes attacks the actual
        wall; cost is ONE bf16 rounding of the image data (~2^-9
        relative = +-0.25 intensity on 0..255 frames).  Accuracy gated
        by the bench's lane0 golden-parity fields before any default
        flip.
    """
    import os
    if os.environ.get("KLT_TPU_EXTRACT_PREC", "high") == "bf16":
        return jax.lax.Precision.DEFAULT, jnp.bfloat16
    return jax.lax.Precision.HIGH, jnp.float32


def onehot_extract_packed(stack: jax.Array, y0: jax.Array, x0: jax.Array,
                          ny: int, nx: int) -> jax.Array:
    """Integer-aligned patch extraction in the channel-block lane
    packing [F, ny, C*nx] the Pallas LK kernel consumes.

    Row-block-aligned formulation: instead of one one-hot row per
    output row (O(F*ny*H*W) MXU work), each feature selects the
    ceil(ny/8)+1 ALIGNED 8-row blocks covering its band with a one-hot
    over H/8 block indices (8x fewer MACs), then the same per-feature
    column one-hot, then a 3-step binary row re-alignment (masked
    static slices, VPU-cheap because it runs on the nx-wide result).

    Runs the one-hot matmuls at Precision.HIGH (3-pass): the one-hot
    side is exact in bf16; only the data's low mantissa bits move,
    <= 2^-16 relative — over two orders of magnitude below the 0.5 px
    tracking contract.  The jnp fast path (onehot_extract above) keeps
    HIGHEST per-row selection so CPU goldens stay byte-identical.
    """
    prec = jax.lax.Precision.HIGH
    c, h_img, w_img = stack.shape
    f = y0.shape[0]
    b = _ROW_BLOCK
    hp = (-h_img) % b
    if hp:
        stack = jnp.pad(stack, ((0, 0), (0, hp), (0, 0)))
    nb_img = (h_img + hp) // b
    # rows rem..rem+ny-1 with rem in [0, b): last touched row is at most
    # ny + b - 2, needing (ny+b-2)//b + 1 aligned blocks (the ny//b + 1
    # formula under-counts for ny % b >= 2 — same fix as _band_select)
    nblk = (ny + b - 2) // b + 1

    b0 = y0 // b
    rem = y0 - b0 * b  # in-block row offset, [0, b)
    blocks = (b0[:, None] +
              jnp.arange(nblk, dtype=jnp.int32)[None, :]).reshape(-1)
    # in-bounds y0 (<= H-ny) only needs block b0+nblk-1 when rem > 0,
    # in which case it exists; the clip is a memory guard for dead lanes
    blocks = jnp.clip(blocks, 0, nb_img - 1)
    blk_oh = (blocks[:, None] ==
              jnp.arange(nb_img, dtype=jnp.int32)[None, :]
              ).astype(jnp.float32)  # [F*nblk, H/b]
    st4 = stack.reshape(c, nb_img, b * w_img)
    band = jnp.einsum("bh,chw->cbw", blk_oh, st4, precision=prec,
                      preferred_element_type=jnp.float32)
    band = band.reshape(c, f, nblk * b, w_img)

    wi = jnp.arange(w_img, dtype=jnp.int32)
    col_oh = ((x0[:, None, None] +
               jnp.arange(nx, dtype=jnp.int32)[None, :, None]) ==
              wi[None, None, :]).astype(jnp.float32)  # [f, nx, W]
    sel = jnp.einsum("cfrw,fxw->frcx", band, col_oh, precision=prec,
                     preferred_element_type=jnp.float32)
    sel = sel.reshape(f, nblk * b, c * nx)

    # binary row re-alignment by rem in {0..b-1}: 3 masked slice-selects
    out = sel
    shift = 1
    while shift < b:
        bit = ((rem & shift) != 0)[:, None, None]
        keep = out.shape[1] - shift
        out = jnp.where(bit, out[:, shift:shift + keep, :],
                        out[:, :keep, :])
        shift *= 2
    return out[:, :ny, :]


def pack_stack_channels(stack: jax.Array) -> jax.Array:
    """[C, H, W] -> channel-block lane packing [H, C*W].

    One relayout per level per frame, amortized over every extraction
    round that reads it (extract_packed_cb)."""
    c, h, w = stack.shape
    return stack.transpose(1, 0, 2).reshape(h, c * w)


def extract_packed_cb(stack_packed: jax.Array, y0: jax.Array,
                      x0: jax.Array, ny: int, nx: int,
                      c: int = 3) -> jax.Array:
    """Patch extraction from a channel-packed image, emitting the LK
    kernel's operand layout [F, ny, C*nx] DIRECTLY — no transposes, no
    (channel, x) axis merge, so XLA materializes no "data formatting"
    relayout between the extraction and the Pallas custom call (the
    dominant cost of the round-1 formulation at large F).

    stack_packed: [H, C*W] (pack_stack_channels).  Row-block-aligned
    one-hot selection over H/8 blocks, then ONE batched dot against a
    per-feature block-diagonal column one-hot [C*W, C*nx], then a
    binary row re-alignment (masked static slices).  One-hot matmuls
    run at Precision.HIGH (selection exact to the data's low mantissa
    bits; see onehot_extract_packed) — NOT governed by
    KLT_TPU_EXTRACT_PREC: this extractor feeds the affine stage's
    PERSISTENT reference patches, where a bf16 rounding compounds into
    kill-decision flips (measured r4: laptops agreement 0.998 -> 0.982
    with the knob applied here).
    """
    prec, band_dt = jax.lax.Precision.HIGH, jnp.float32
    h, cw = stack_packed.shape
    w_img = cw // c
    f = y0.shape[0]
    # block-diagonal column one-hot: lane j of the output reads lane
    # (j // nx) * W + x0 + (j % nx) of the packed row
    j = jnp.arange(c * nx, dtype=jnp.int32)
    target = (j // nx) * w_img + (j % nx)                 # [C*nx]
    wp = jnp.arange(cw, dtype=jnp.int32)
    col_oh = ((x0[:, None, None] + target[None, None, :]) ==
              wp[None, :, None]).astype(jnp.float32)      # [F, C*W, C*nx]
    if f >= _ROWS_MIN_F:
        # exact-row band: no 8-row blocks, no realign (the blocked
        # band materialization + 3-step realign dominate as relayout
        # traffic at large F — same finding as extract_flat_rows;
        # round-3 affine trace: realign 3.7 ms/pair at F=2000, ny=48)
        rows = (y0[:, None] +
                jnp.arange(ny, dtype=jnp.int32)[None, :]).reshape(-1)
        hi = jnp.arange(h, dtype=jnp.int32)
        row_oh = (rows[:, None] == hi[None, :]).astype(jnp.float32)
        band = jnp.dot(row_oh, stack_packed, precision=prec,
                       preferred_element_type=band_dt)
        band = band.reshape(f, ny, cw)
        return jnp.einsum("frw,fwj->frj", band, col_oh, precision=prec,
                          preferred_element_type=jnp.float32)
    band, rem = _band_select(stack_packed, y0, ny,
                             mm=(prec, band_dt))
    sel = jnp.einsum("frw,fwj->frj", band, col_oh, precision=prec,
                     preferred_element_type=jnp.float32)  # [F, 24, C*nx]
    return _realign_rows(sel, rem, ny)


def _band_select(stack_packed: jax.Array, y0: jax.Array, ny: int,
                 mm=None):
    """Row-block-aligned band selection shared by the packed
    extractors: returns (band [F, nblk*8, C*W], rem [F]).  mm
    overrides the (precision, band dtype) pair; default follows
    KLT_TPU_EXTRACT_PREC."""
    prec, band_dt = mm if mm is not None else _extract_mm()
    h, cw = stack_packed.shape
    b = _ROW_BLOCK
    hp = (-h) % b
    if hp:
        stack_packed = jnp.pad(stack_packed, ((0, hp), (0, 0)))
    nb_img = (h + hp) // b
    # rows rem..rem+ny-1 with rem in [0, b): the last touched row is at
    # most ny + b - 2, needing (ny+b-2)//b + 1 aligned blocks.  (The
    # round-1 formula ny//b + 1 under-counted for ny < b — caught by
    # the window-geometry fuzz test.)
    nblk = (ny + b - 2) // b + 1
    f = y0.shape[0]
    b0 = y0 // b
    rem = y0 - b0 * b
    blocks = (b0[:, None] +
              jnp.arange(nblk, dtype=jnp.int32)[None, :]).reshape(-1)
    blocks = jnp.clip(blocks, 0, nb_img - 1)
    blk_oh = (blocks[:, None] ==
              jnp.arange(nb_img, dtype=jnp.int32)[None, :]
              ).astype(jnp.float32)
    st4 = stack_packed.reshape(nb_img, b * cw)
    band = jnp.einsum("bh,hw->bw", blk_oh, st4, precision=prec,
                      preferred_element_type=band_dt)
    return band.reshape(f, nblk * b, cw), rem


def _realign_rows(sel: jax.Array, rem: jax.Array, ny: int):
    """Binary row re-alignment by rem in [0, 8)."""
    out = sel
    shift = 1
    while shift < _ROW_BLOCK:
        bit = ((rem & shift) != 0)[:, None, None]
        keep = out.shape[1] - shift
        out = jnp.where(bit, out[:, shift:shift + keep, :],
                        out[:, :keep, :])
        shift *= 2
    return out[:, :ny, :]


def extract_flat(stack_packed: jax.Array, y0: jax.Array, x0: jax.Array,
                 ny: int, nx: int, k: int, c: int = 3) -> jax.Array:
    """Patch extraction onto a flattened-lane K-canvas [F, c*k*k] (the
    v2 LK kernel's operand layout, pallas/lk2.py): lane
    J = r*(c*k) + ch*k + i holds channel ch of patch pixel (r, i);
    rows >= ny / cols >= nx stay zero.

    Same row-block one-hot + block-diagonal column one-hot as
    extract_packed_cb, with the canvas geometry folded into the column
    one-hot so the only layout op is the final rows->lanes reshape.

    At batched feature counts the blocked band materialization and the
    3-step realign dominate as pure HBM relayout traffic (round-3
    trace: realign alone 1.6 ms/step at F=2400); the exact-row
    formulation (extract_flat_rows) removes both and wins 1.6-2.3x
    from F~2400 up, so large F dispatches there (bit-identical)."""
    f = y0.shape[0]
    if _TILED:
        return extract_flat_tiled(stack_packed, y0, x0, ny, nx, k, c)
    if f >= _ROWS_MIN_F:
        return extract_flat_rows(stack_packed, y0, x0, ny, nx, k, c)
    return extract_flat_blocked(stack_packed, y0, x0, ny, nx, k, c)


def extract_flat_blocked(stack_packed: jax.Array, y0: jax.Array,
                         x0: jax.Array, ny: int, nx: int, k: int,
                         c: int = 3) -> jax.Array:
    """The 8-row-block formulation of extract_flat (band select +
    realign), callable directly so tools/bench_extract2.py can A/B it
    against the rows formulation above the _ROWS_MIN_F dispatch
    threshold (extract_flat itself self-dispatches)."""
    prec, _ = _extract_mm()
    h, cw = stack_packed.shape
    w_img = cw // c
    f = y0.shape[0]
    band, rem = _band_select(stack_packed, y0, ny)

    # Block-diagonal column one-hot.  (A per-channel split with 3x
    # fewer MACs plus a lane interleave was measured SLOWER
    # in-pipeline, like every other extraction restructuring on this
    # toolchain — see PARITY.md's negative-results list.)
    j = jnp.arange(c * k, dtype=jnp.int32)
    ch = j // k
    i = j % k
    target = ch * w_img + i                     # [c*k]
    valid = (i < nx)
    wp = jnp.arange(cw, dtype=jnp.int32)
    col_oh = (((x0[:, None, None] + target[None, None, :]) ==
               wp[None, :, None]) &
              valid[None, None, :]).astype(jnp.float32)  # [F, C*W, c*k]
    sel = jnp.einsum("frw,fwj->frj", band, col_oh, precision=prec,
                     preferred_element_type=jnp.float32)
    out = _realign_rows(sel, rem, ny)           # [F, ny, c*k]
    if ny < k:
        out = jnp.pad(out, ((0, 0), (0, k - ny), (0, 0)))
    return out.reshape(f, c * k * k)


def extract_flat_rows(stack_packed: jax.Array, y0: jax.Array,
                      x0: jax.Array, ny: int, nx: int, k: int,
                      c: int = 3) -> jax.Array:
    """extract_flat via EXACT-row one-hot selection (no 8-row blocks,
    no realign).  At large F the blocked formulation's band
    materialization ([F, nblk*8, C*W]) and 3-step realign dominate as
    pure HBM relayout traffic; selecting the exact ny rows costs ~8x
    the row-stage MACs but at MXU-friendly contraction H, removes the
    realign entirely, and shrinks the band by nblk*8/ny.  Bit-identical
    to extract_flat (one-hot selection at the same precision)."""
    prec, band_dt = _extract_mm()
    h, cw = stack_packed.shape
    w_img = cw // c
    f = y0.shape[0]
    rows = (y0[:, None] +
            jnp.arange(ny, dtype=jnp.int32)[None, :]).reshape(-1)
    hi = jnp.arange(h, dtype=jnp.int32)
    row_oh = (rows[:, None] == hi[None, :]).astype(jnp.float32)
    band = jnp.dot(row_oh, stack_packed, precision=prec,
                   preferred_element_type=band_dt)  # [F*ny, C*W]
    band = band.reshape(f, ny, cw)

    j = jnp.arange(c * k, dtype=jnp.int32)
    ch = j // k
    i = j % k
    target = ch * w_img + i
    valid = (i < nx)
    wp = jnp.arange(cw, dtype=jnp.int32)
    col_oh = (((x0[:, None, None] + target[None, None, :]) ==
               wp[None, :, None]) &
              valid[None, None, :]).astype(jnp.float32)  # [F, C*W, c*k]
    out = jnp.einsum("frw,fwj->frj", band, col_oh, precision=prec,
                     preferred_element_type=jnp.float32)  # [F, ny, c*k]
    if ny < k:
        out = jnp.pad(out, ((0, 0), (0, k - ny), (0, 0)))
    return out.reshape(f, c * k * k)


_TILE_STRIDE = int(os.environ.get("KLT_TPU_EXTRACT_TILE_STRIDE", "16"))
# default off until measured on hardware (KLT_TPU_EXTRACT_TILED=1)
_TILED = os.environ.get("KLT_TPU_EXTRACT_TILED", "0") == "1"


def extract_flat_tiled(stack_packed: jax.Array, y0: jax.Array,
                       x0: jax.Array, ny: int, nx: int, k: int,
                       c: int = 3, st: int = None) -> jax.Array:
    """extract_flat via exact-row one-hot against a COLUMN-TILED image.

    The exact-row band [F*ny, C*W] materializes the full image width
    per selected row — 123 KB/feature at k=16 on 640-wide frames, and
    HBM traffic on that band is the extraction wall from F~2000 up
    (round-3 trace: ~60% of extraction time).  Tiling each channel
    into (st)-stride, (st+k-1)-wide overlapping column strips stacked
    VERTICALLY — [T*H, C*(st+k-1)] built once per (image, round) and
    CSE'd by XLA — lets the row one-hot select (tile, row) pairs, so
    the band is C*(st+k-1) wide (~6 KB/feature): the one-hot row
    selection contracts over T*H instead of H (still strength-reduced
    iota-compare), and the column one-hot shrinks by W/(st+k-1).

    Bit-identical to extract_flat_rows: the tiled image holds the same
    values, selection is 0/1 at the same precision.
    """
    prec, band_dt = _extract_mm()
    if st is None:
        st = _TILE_STRIDE
    h, cw = stack_packed.shape
    w_img = cw // c
    f = y0.shape[0]
    tw = st + k - 1
    nt = (w_img - k) // st + 1 if w_img > k else 1
    if nt <= 1 or tw >= w_img:
        return extract_flat_rows(stack_packed, y0, x0, ny, nx, k, c)

    # [T*H, C*tw] tiled image: tile t, channel ch holds packed cols
    # [ch*W + t*st, ch*W + t*st + tw) (zero-padded past W; in-bounds
    # x0 <= W-k never reads the padding)
    pads = max(0, (nt - 1) * st + tw - w_img)
    spp = jnp.pad(stack_packed.reshape(h, c, w_img),
                  ((0, 0), (0, 0), (0, pads)))
    tiles = [spp[:, :, t * st:t * st + tw].reshape(h, c * tw)
             for t in range(nt)]
    img_t = jnp.concatenate(tiles, axis=0)

    tile = jnp.clip(x0 // st, 0, nt - 1)
    x0l = x0 - tile * st
    rows = ((tile * h + y0)[:, None] +
            jnp.arange(ny, dtype=jnp.int32)[None, :]).reshape(-1)
    hi = jnp.arange(nt * h, dtype=jnp.int32)
    row_oh = (rows[:, None] == hi[None, :]).astype(jnp.float32)
    band = jnp.dot(row_oh, img_t, precision=prec,
                   preferred_element_type=band_dt)  # [F*ny, C*tw]
    band = band.reshape(f, ny, c * tw)

    j = jnp.arange(c * k, dtype=jnp.int32)
    ch = j // k
    i = j % k
    target = ch * tw + i
    valid = (i < nx)
    wp = jnp.arange(c * tw, dtype=jnp.int32)
    col_oh = (((x0l[:, None, None] + target[None, None, :]) ==
               wp[None, :, None]) &
              valid[None, None, :]).astype(jnp.float32)
    out = jnp.einsum("frw,fwj->frj", band, col_oh, precision=prec,
                     preferred_element_type=jnp.float32)
    if ny < k:
        out = jnp.pad(out, ((0, 0), (0, k - ny), (0, 0)))
    return out.reshape(f, c * k * k)


def extract_flat_rows_cb(stack_packed: jax.Array, y0: jax.Array,
                         x0: jax.Array, ny: int, nx: int, k: int,
                         c: int = 3) -> jax.Array:
    """extract_flat via exact-row one-hot + 8-lane COLUMN-BLOCK
    selection (and a 3-step lane realign).

    MEASURED NEGATIVE RESULT (kept as the A/B record, not wired into
    any hot path): on TPU v5e the batched [F, ny*8, CB] @ [F, CB, c*nbx]
    tiny-matmul is 1.35-1.7x SLOWER than extract_flat_rows' big
    column one-hot (tools/bench_extract2.py: 1784 vs 1317 us at
    F=2400, 4593 vs 3026 at F=4096) — XLA handles the [F, C*W, c*k]
    one-hot better than a 43x-smaller one-hot driving F tiny matmuls.

    The intended structure:

      1. permute the packed stack's lanes ONCE per call so lane
         l*CB + b holds original lane b*8 + l (b = col block, l = lane
         within block) — the row-stage matmul then lands the band
         directly in (l, b)-major layout, no transpose of the big band;
      2. exact-row one-hot selects the ny rows (MXU contraction H);
      3. per-feature col-BLOCK one-hot picks nbx aligned blocks per
         channel (batched matmul, contraction C*W/8 on the minor dim);
      4. minor-dim rearrange (l, ch, bi) -> (ch, bi, l) on the small
         result, then a binary 3-step lane realign by x0 % 8.

    Requires W % 8 == 0 (channel boundaries block-aligned) and
    k <= 8 * nbx; callers fall back to extract_flat_rows otherwise.
    Bit-identical to extract_flat (one-hot selection, same precision).
    """
    prec = jax.lax.Precision.HIGH
    h, cw = stack_packed.shape
    w_img = cw // c
    f = y0.shape[0]
    nbx = (nx + _ROW_BLOCK - 2) // _ROW_BLOCK + 1
    if w_img % _ROW_BLOCK or k > _ROW_BLOCK * nbx:
        return extract_flat_rows(stack_packed, y0, x0, ny, nx, k, c)
    b8 = _ROW_BLOCK
    cb = cw // b8
    w8 = w_img // b8

    # 1. lane permutation: [H, CW] -> [H, 8, CB] laid out l-major
    stack_t = stack_packed.reshape(h, cb, b8).transpose(0, 2, 1)
    stack_t = stack_t.reshape(h, cw)

    # 2. exact-row band, already (l, b)-major in lanes
    rows = (y0[:, None] +
            jnp.arange(ny, dtype=jnp.int32)[None, :]).reshape(-1)
    hi = jnp.arange(h, dtype=jnp.int32)
    row_oh = (rows[:, None] == hi[None, :]).astype(jnp.float32)
    band = jnp.dot(row_oh, stack_t, precision=prec,
                   preferred_element_type=jnp.float32)
    band = band.reshape(f, ny * b8, cb)

    # 3. per-feature column-block one-hot [F, CB, c*nbx]
    cc = jnp.arange(c * nbx, dtype=jnp.int32)
    ch = cc // nbx
    bi = cc % nbx
    blk = jnp.clip(x0[:, None] // b8 + ch[None, :] * w8 + bi[None, :],
                   0, cb - 1)                       # [F, c*nbx]
    bidx = jnp.arange(cb, dtype=jnp.int32)
    col_oh = (blk[:, None, :] ==
              bidx[None, :, None]).astype(jnp.float32)  # [F, CB, c*nbx]
    sel = jnp.einsum("frb,fbc->frc", band, col_oh, precision=prec,
                     preferred_element_type=jnp.float32)
    # [F, ny*8, c*nbx]: dims (r, l) x (ch, bi)

    # 4. rearrange to (r, ch, bi, l) and realign lanes by x0 % 8
    sel = sel.reshape(f, ny, b8, c * nbx).transpose(0, 1, 3, 2)
    sel = sel.reshape(f, ny, c, nbx * b8).reshape(f, ny, c * nbx * b8)
    rem = x0 % b8
    shift = 1
    while shift < b8:
        bit = ((rem & shift) != 0)[:, None, None]
        keep = sel.shape[2] - shift
        shifted = jnp.pad(sel[:, :, shift:shift + keep],
                          ((0, 0), (0, 0), (0, shift)))
        sel = jnp.where(bit, shifted, sel)
        shift *= 2
    sel = sel.reshape(f, ny, c, nbx * b8)[:, :, :, :k]
    lane_i = jnp.arange(k, dtype=jnp.int32)
    sel = sel * (lane_i[None, None, None, :] < nx)
    out = sel.reshape(f, ny, c * k)
    if ny < k:
        out = jnp.pad(out, ((0, 0), (0, k - ny), (0, 0)))
    return out.reshape(f, c * k * k)


def select_windows_bilinear(patches: jax.Array, oy: jax.Array,
                            ox: jax.Array, ay: jax.Array, ax: jax.Array,
                            height: int, width: int) -> jax.Array:
    """Bilinear (height x width) window selection inside resident patches.

    patches: [F, C, Sy, Sx]; oy, ox int32 [F] integer window corners in
    patch coordinates (pre-clipped to [0, S-height-1]); ay, ax fractional
    parts.  Returns [C, F, height*width].

    W = Rb @ P @ Cb^T with Rb/Cb carrying the (1-a, a) bilinear weights —
    batched MXU matmuls, no gathers.  Equals the reference's 4-term
    bilinear blend (src/V1/trackFeatures.c:53-56) up to ~1 ulp.
    """
    f, c, sy, sx = patches.shape
    sy_i = jnp.arange(sy, dtype=jnp.int32)
    sx_i = jnp.arange(sx, dtype=jnp.int32)

    rr = oy[:, None, None] + jnp.arange(height,
                                        dtype=jnp.int32)[None, :, None]
    rb = ((sy_i[None, None, :] == rr) * (1 - ay)[:, None, None] +
          (sy_i[None, None, :] == rr + 1) * ay[:, None, None])
    cc = ox[:, None, None] + jnp.arange(width,
                                        dtype=jnp.int32)[None, :, None]
    cb = ((sx_i[None, None, :] == cc) * (1 - ax)[:, None, None] +
          (sx_i[None, None, :] == cc + 1) * ax[:, None, None])

    a = jnp.einsum("fhs,fcst->fcht", rb.astype(jnp.float32), patches,
                   precision=jax.lax.Precision.HIGHEST,
                   preferred_element_type=jnp.float32)
    w = jnp.einsum("fcht,fwt->fchw", a, cb.astype(jnp.float32),
                   precision=jax.lax.Precision.HIGHEST,
                   preferred_element_type=jnp.float32)
    return w.reshape(f, c, height * width).transpose(1, 0, 2)


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
