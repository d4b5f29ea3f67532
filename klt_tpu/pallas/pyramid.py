"""Fused Gaussian-pyramid + gradient kernel (Pallas TPU).

ONE kernel call builds everything the tracker needs from a raw frame —
float conversion, pre-smoothing, every level's gradient maps, and the
inter-level smooth + decimation — entirely VMEM-resident.  The
separable convolutions are tap-unrolled shift-FMA loops on the VPU (f32
all the way: no bf16 rounding on the accuracy-critical path); the
strided decimation, which Mosaic cannot express as a vector slice, is
two bit-exact one-hot f32 matmuls on the MXU.

This is the TPU analogue of the reference's V3 device-resident pyramid
chain (src/V3/pyramidGPU.cu:186-235 + tiled convolutions
src/V3/convolveGPU.cu:139-254), collapsed from ~10 kernel launches per
frame to one.

Semantics match klt_tpu/ops/convolve.py (and therefore the C reference,
src/V1/convolve.c:137-242): taps applied in reversed order, output
borders inside each kernel radius ZEROED, vertical pass consuming the
horizontally-zeroed intermediate, decimation by `subsampling` at offset
`subsampling // 2` (src/V1/pyramid.c:117-124).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import TrackingConfig, pyramid_shapes
from ..kernels import gaussian_kernels

# VMEM budget gate: the fused kernel holds ~8 live [H, W] f32 buffers
# (v5e VMEM is 128M; the call requests a 100M scoped limit).
_VMEM_BUDGET_BYTES = 88 * 1024 * 1024
_LIVE_BUFFERS = 8


def _iota_mask(h, w, radius, axis):
    """bool [h, w] mask: False within `radius` of either end along axis."""
    idx = jax.lax.broadcasted_iota(jnp.int32, (h, w), axis)
    n = w if axis == 1 else h
    return (idx >= radius) & (idx < n - radius)


def _hconv(x, taps):
    """Horizontal pass: out[y, i] = sum_d x[y, i+d] * tap[r-d], borders
    zeroed (src/V1/convolve.c:137-182)."""
    width = len(taps)
    r = width // 2
    h, w = x.shape
    pad = jnp.pad(x, ((0, 0), (r, r)))
    acc = pad[:, 0:w] * taps[width - 1]
    for k in range(1, width):
        # offset d = k - r uses tap[r - d] = taps[width - 1 - k]
        acc = acc + pad[:, k:k + w] * taps[width - 1 - k]
    return jnp.where(_iota_mask(h, w, r, 1), acc, 0.0)


def _vconv(x, taps):
    """Vertical pass with zeroed borders (src/V1/convolve.c:189-242)."""
    width = len(taps)
    r = width // 2
    h, w = x.shape
    pad = jnp.pad(x, ((r, r), (0, 0)))
    acc = pad[0:h, :] * taps[width - 1]
    for k in range(1, width):
        acc = acc + pad[k:k + h, :] * taps[width - 1 - k]
    return jnp.where(_iota_mask(h, w, r, 0), acc, 0.0)


def _sep(x, htaps, vtaps):
    return _vconv(_hconv(x, htaps), vtaps)


def _taps(cfg: TrackingConfig):
    g_s, _ = gaussian_kernels(cfg.smooth_sigma)
    g_g, d_g = gaussian_kernels(cfg.grad_sigma)
    g_p, _ = gaussian_kernels(cfg.pyramid_sigma)
    tup = lambda a: tuple(float(t) for t in a)
    return tup(g_s), tup(g_g), tup(d_g), tup(g_p)


def _decimate(x, h_out, w_out, s, sh):
    """Strided decimation x[sh::s, sh::s][:h_out, :w_out] as two one-hot
    f32 matmuls (Mosaic has no strided slices; a 0/1 f32 matmul on the
    MXU is bit-exact selection)."""
    h, w = x.shape
    ri = jax.lax.broadcasted_iota(jnp.int32, (h_out, h), 0)
    rj = jax.lax.broadcasted_iota(jnp.int32, (h_out, h), 1)
    rsel = (rj == ri * s + sh).astype(jnp.float32)
    ci = jax.lax.broadcasted_iota(jnp.int32, (w, w_out), 0)
    cj = jax.lax.broadcasted_iota(jnp.int32, (w, w_out), 1)
    csel = (ci == cj * s + sh).astype(jnp.float32)
    band = jnp.dot(rsel, x, precision=jax.lax.Precision.HIGHEST,
                   preferred_element_type=jnp.float32)
    return jnp.dot(band, csel, precision=jax.lax.Precision.HIGHEST,
                   preferred_element_type=jnp.float32)


@functools.lru_cache(maxsize=32)
def _fused_call(h: int, w: int, cfg: TrackingConfig, in_dtype_name: str):
    """One Pallas call building the whole pyramid: presmooth + per-level
    gradients + inter-level smooth/decimate, all VMEM-resident.

    Emits one STACKED [3, H_l, W_l] output per level (intensity, gradx,
    grady) — exactly the layout the LK level driver consumes, so the
    scan hot path never re-stacks."""
    g_s, g_g, d_g, g_p = _taps(cfg)
    from ..config import pyramid_shapes
    shapes = pyramid_shapes(w, h, cfg)
    nlev = cfg.n_pyramid_levels
    s = cfg.subsampling
    sh = s // 2

    def kernel(img_ref, *out_refs):
        f = img_ref[:]
        if f.dtype != jnp.float32:
            f = f.astype(jnp.int32).astype(jnp.float32)
        level = _sep(f, g_s, g_s)  # pre-smoothing (trackFeatures.c:1296)
        for lvl in range(nlev):
            tmp_d = _hconv(level, d_g)
            tmp_g = _hconv(level, g_g)
            out_refs[lvl][0] = level
            out_refs[lvl][1] = _vconv(tmp_d, g_g)
            out_refs[lvl][2] = _vconv(tmp_g, d_g)
            if lvl < nlev - 1:
                sm = _sep(level, g_p, g_p)
                ncols, nrows = shapes[lvl + 1]
                level = _decimate(sm, nrows, ncols, s, sh)

    from . import interpret_mode
    out_shape = [jax.ShapeDtypeStruct((3, r, c), jnp.float32)
                 for (c, r) in shapes]
    return pl.pallas_call(
        kernel,
        out_shape=out_shape,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * nlev,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret_mode(),
    )


def supported(img_shape, cfg: TrackingConfig) -> bool:
    h, w = img_shape[-2], img_shape[-1]
    if h * w * 4 * _LIVE_BUFFERS > _VMEM_BUDGET_BYTES:
        return False
    shapes = pyramid_shapes(w, h, cfg)
    if min(shapes[-1]) < 2:
        return False
    return True


# ------------------------------------------------------------------ #
# natively batched variant                                             #
# ------------------------------------------------------------------ #
# A vmap over the single-image kernel runs B sequential grid instances
# whose [H, W] tap steps are ISSUE-LATENCY bound at small frames (r4
# roofline: 9.9 us/launch = 13% of HBM peak at 320x240; the pyramid ate
# 34% of the flagship step).  Processing a Bt-image tile per grid
# instance multiplies per-op work by Bt without changing any per-image
# f32 sequence: the H-pass merges the batch into the row axis (rows are
# independent), the V-pass shifts a 3D block along its middle axis, and
# decimation stays per-image 2D matmuls.  Bit-equal per image to the
# single-image kernel (tests/test_pallas.py, interpret mode).


def _hconv_b(x, taps):
    """Batched horizontal pass on [Bt, H, W]; per-image results
    bit-equal to _hconv (rows are independent, so merging [Bt, H] into
    one row axis changes scheduling only)."""
    width = len(taps)
    r = width // 2
    bt, h, w = x.shape
    x2 = x.reshape(bt * h, w)
    pad = jnp.pad(x2, ((0, 0), (r, r)))
    acc = pad[:, 0:w] * taps[width - 1]
    for k in range(1, width):
        acc = acc + pad[:, k:k + w] * taps[width - 1 - k]
    idx = jax.lax.broadcasted_iota(jnp.int32, (bt * h, w), 1)
    acc = jnp.where((idx >= r) & (idx < w - r), acc, 0.0)
    return acc.reshape(bt, h, w)


def _vconv_b(x, taps):
    """Batched vertical pass on [Bt, H, W] (shifts along axis 1)."""
    width = len(taps)
    r = width // 2
    bt, h, w = x.shape
    pad = jnp.pad(x, ((0, 0), (r, r), (0, 0)))
    acc = pad[:, 0:h, :] * taps[width - 1]
    for k in range(1, width):
        acc = acc + pad[:, k:k + h, :] * taps[width - 1 - k]
    idx = jax.lax.broadcasted_iota(jnp.int32, (bt, h, w), 1)
    return jnp.where((idx >= r) & (idx < h - r), acc, 0.0)


def _sep_b(x, htaps, vtaps):
    return _vconv_b(_hconv_b(x, htaps), vtaps)


def _decimate_b(x, h_out, w_out, s, sh):
    """Per-image one-hot decimation of [Bt, H, W] (static Bt unroll of
    the 2D MXU matmuls — identical per-image arithmetic)."""
    return jnp.stack([_decimate(x[b], h_out, w_out, s, sh)
                      for b in range(x.shape[0])])


# Measured live set of the batched kernel at 320x240 (Mosaic scoped
# vmem report): ~7.6 MB/image = ~25 f32 buffers — the decimate unroll,
# padded conv intermediates and per-level output blocks all stay live,
# unlike the single-image kernel's ~8.
_LIVE_BUFFERS_BATCHED = 26


def batch_tile(b: int, h: int, w: int) -> int:
    """Largest divisor of b whose live working set fits the VMEM
    budget (0 if even one image does not fit)."""
    per_img = h * w * 4 * _LIVE_BUFFERS_BATCHED
    if per_img > _VMEM_BUDGET_BYTES:
        return 0
    bt = max(1, _VMEM_BUDGET_BYTES // per_img)
    # tile cap 4: bt=8 at 320x240 wedged the Mosaic/AOT compile for
    # >80 min (bt=4 compiles in minutes and already amortizes the
    # per-op issue latency 4x); larger tiles also gain little
    bt = min(bt, 4, b)
    while b % bt:
        bt -= 1
    return bt


def supported_batched(imgs_shape, cfg: TrackingConfig) -> bool:
    if len(imgs_shape) != 3:
        return False
    b, h, w = imgs_shape
    # bt == 1 has no latency-amortization win over the single-image
    # kernel — callers should vmap that instead (also keeps 1-image
    # builds on the identical compiled program as per-step builds)
    return b > 1 and batch_tile(b, h, w) > 1 and supported((h, w), cfg)


@functools.lru_cache(maxsize=32)
def _fused_call_batched(bt: int, h: int, w: int, cfg: TrackingConfig,
                        in_dtype_name: str):
    """Grid-FREE whole-tile kernel on [bt, H, W].  A Pallas grid over
    batch tiles wedged the Mosaic/AOT compile (observed: multi-tile
    grids hang >80 min where the identical grid-free kernel compiles
    in minutes), so tiling happens at the JAX level instead — the
    caller maps this call over bt-sized chunks."""
    g_s, g_g, d_g, g_p = _taps(cfg)
    shapes = pyramid_shapes(w, h, cfg)
    nlev = cfg.n_pyramid_levels
    s = cfg.subsampling
    sh = s // 2

    def kernel(img_ref, *out_refs):
        f = img_ref[:]
        if f.dtype != jnp.float32:
            f = f.astype(jnp.int32).astype(jnp.float32)
        level = _sep_b(f, g_s, g_s)
        for lvl in range(nlev):
            tmp_d = _hconv_b(level, d_g)
            tmp_g = _hconv_b(level, g_g)
            out_refs[lvl][:, 0] = level
            out_refs[lvl][:, 1] = _vconv_b(tmp_d, g_g)
            out_refs[lvl][:, 2] = _vconv_b(tmp_g, d_g)
            if lvl < nlev - 1:
                sm = _sep_b(level, g_p, g_p)
                ncols, nrows = shapes[lvl + 1]
                level = _decimate_b(sm, nrows, ncols, s, sh)

    from . import interpret_mode
    out_shape = [jax.ShapeDtypeStruct((bt, 3, r, c), jnp.float32)
                 for (c, r) in shapes]
    return pl.pallas_call(
        kernel,
        out_shape=out_shape,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * nlev,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret_mode(),
    )


def fused_build_pyramid_stacks_batched(imgs: jax.Array,
                                       cfg: TrackingConfig):
    """imgs: uint8/f32 [B, H, W] -> finest-first list of
    [B, 3, H_l, W_l] stacks, built bt images per kernel instance
    (JAX-level chunking over one compiled grid-free tile program)."""
    b, h, w = imgs.shape
    bt = batch_tile(b, h, w)
    call = _fused_call_batched(bt, h, w, cfg, str(imgs.dtype))
    if bt == b:
        outs = call(imgs)
        return list(outs) if isinstance(outs, (list, tuple)) else [outs]
    chunks = [call(imgs[i:i + bt]) for i in range(0, b, bt)]
    return [jnp.concatenate([c[lvl] for c in chunks])
            for lvl in range(len(chunks[0]))]


def fused_build_pyramid_stacks(img: jax.Array, cfg: TrackingConfig):
    """Finest-first list of [3, H_l, W_l] (intensity, gradx, grady)
    stacks — the LK driver's native input layout."""
    h, w = img.shape[-2], img.shape[-1]
    call = _fused_call(h, w, cfg, str(img.dtype))
    outs = call(img)
    return list(outs) if isinstance(outs, (list, tuple)) else [outs]


def fused_build_image_pyramids(img: jax.Array, cfg: TrackingConfig):
    """Drop-in Pallas replacement for ops.pyramid.build_image_pyramids.

    img: uint8/f32 [H, W].  Returns (pyr, gradx, grady) finest-first lists.
    """
    stacks = fused_build_pyramid_stacks(img, cfg)
    return ([s[0] for s in stacks], [s[1] for s in stacks],
            [s[2] for s in stacks])
