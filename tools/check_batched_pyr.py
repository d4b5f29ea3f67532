"""On-chip validation + micro-benchmark of the natively batched
pyramid kernel (pallas/pyramid.py::fused_build_pyramid_stacks_batched).

Asserts BIT equality per image against both the vmapped single-image
kernel and a direct single-image call, then times batched vs vmapped
at the flagship batch size.  Run on the real TPU:

    python tools/check_batched_pyr.py [B] [dataset_frame.pgm]
"""
import sys
import os
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_comp"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp  # noqa: E402

from klt_tpu.config import TrackingConfig  # noqa: E402
from klt_tpu.pallas import pyramid as pp  # noqa: E402
from klt_tpu.io.pnm import read_pgm  # noqa: E402


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    path = (sys.argv[2] if len(sys.argv) > 2 else
            "/root/reference/data/images_provided/img0.pgm")
    cfg = TrackingConfig(sequential_mode=True)
    img = read_pgm(path)
    imgs = jnp.asarray(np.broadcast_to(img, (b,) + img.shape).copy())
    imgs = imgs.at[:, 0, 0].set(jnp.arange(b, dtype=imgs.dtype))
    print(f"B={b} tile={pp.batch_tile(b, *img.shape)} shape={img.shape}")

    batched = jax.jit(
        lambda im: pp.fused_build_pyramid_stacks_batched(im, cfg))
    vmapped = jax.jit(lambda im: jax.vmap(
        lambda x: tuple(pp.fused_build_pyramid_stacks(x, cfg)))(im))
    single = jax.jit(lambda im: pp.fused_build_pyramid_stacks(im, cfg))

    ob = jax.block_until_ready(batched(imgs))
    ov = jax.block_until_ready(vmapped(imgs))
    for lvl, (a, c) in enumerate(zip(ob, ov)):
        mm = int((np.asarray(a).view(np.uint32) !=
                  np.asarray(c).view(np.uint32)).sum())
        print(f"lvl {lvl}: batched-vs-vmap bit mismatches {mm}")
        assert mm == 0
    r0 = jax.block_until_ready(single(imgs[0]))
    for lvl, (a, c) in enumerate(zip(ob, r0)):
        mm = int((np.asarray(a[0]).view(np.uint32) !=
                  np.asarray(c).view(np.uint32)).sum())
        print(f"lvl {lvl}: batched[0]-vs-single bit mismatches {mm}")
        assert mm == 0

    def bench(fn, arg, n=30):
        jax.block_until_ready(fn(arg))
        t0 = time.perf_counter()
        for _ in range(n):
            r = fn(arg)
        jax.block_until_ready(r)
        return (time.perf_counter() - t0) / n * 1e6

    tv = bench(vmapped, imgs)
    tb = bench(batched, imgs)
    print(f"B={b} vmapped: {tv:.1f} us/call  batched: {tb:.1f} us/call "
          f"({tv / tb:.2f}x)")


if __name__ == "__main__":
    main()
