"""Trace/ablation breakdown of the laptops-affine config (BASELINE
config 3): where do the ~27 ms/frame go?

Ablations (each timed over the same 60-frame laptops window):
  * full       — track_sequence_affine as benched
  * no_affine  — translation-only track_sequence on the same config
  * affine_i1  — affine_max_iterations=1 (isolates per-iteration cost)

Plus one merged trace of the full path, categorized.
"""

import collections
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

import klt_tpu as klt
from klt_tpu.runtime.pipeline import track_sequence, track_sequence_affine
from klt_tpu.runtime.tracker import KLTracker
from klt_tpu.utils.profiling import trace, op_breakdown

DATA = "/root/reference/data/images_laptops"


def main():
    n_frames = int(os.environ.get("N_FRAMES", "61"))
    frames = [klt.read_pgm(os.path.join(DATA, f"img{i}.pgm"))
              for i in range(1, n_frames + 1)]
    cfg = klt.TrackingConfig(sequential_mode=True,
                             affine_consistency_check=2,
                             n_pyramid_levels=4, subsampling=2)
    tr = KLTracker(cfg)
    fl = klt.FeatureList.create(2000)
    tr.select_good_features(frames[0], fl)
    x0 = jnp.asarray(fl.x)
    y0 = jnp.asarray(fl.y)
    v0 = jnp.asarray(fl.val)
    fd = jnp.asarray(np.stack(frames))
    n_pairs = fd.shape[0] - 1

    if os.environ.get("SKIP_TIMING"):
        r = track_sequence_affine(fd, x0, y0, v0, cfg)
        jax.block_until_ready(r)
        _trace_only(fd, x0, y0, v0, cfg, n_pairs)
        return

    def timed(fn, label, reps=3):
        r = fn()
        np.asarray(jax.tree_util.tree_leaves(r)[0])  # drain async compile
        t0 = time.perf_counter()
        for _ in range(reps):
            r = fn()
            jax.block_until_ready(r)
        dt = (time.perf_counter() - t0) / (reps * n_pairs)
        print(f"{label:14s} {dt * 1e3:8.2f} ms/frame  "
              f"({1.0 / dt:7.1f} fps)", flush=True)
        return dt

    full = timed(lambda: track_sequence_affine(fd, x0, y0, v0, cfg),
                 "full")
    noaff = timed(lambda: track_sequence(fd, x0, y0, v0, cfg),
                  "no_affine")
    cfg1 = klt.TrackingConfig(sequential_mode=True,
                              affine_consistency_check=2,
                              n_pyramid_levels=4, subsampling=2,
                              affine_max_iterations=1)
    aff1 = timed(lambda: track_sequence_affine(fd, x0, y0, v0, cfg1),
                 "affine_i1")

    print(json.dumps({
        "full_ms": round(full * 1e3, 2),
        "translation_ms": round(noaff * 1e3, 2),
        "affine_total_ms": round((full - noaff) * 1e3, 2),
        "affine_fixed_ms": round((aff1 - noaff) * 1e3, 2),
        "affine_per_iter_ms": None,
    }), flush=True)

    if os.environ.get("TRACE", "1") == "1":
        _trace_only(fd, x0, y0, v0, cfg, n_pairs)


def _trace_only(fd, x0, y0, v0, cfg, n_pairs):
    merged = collections.defaultdict(float)
    counts = {}
    for widx in range(2):
        d = f"/tmp/affine_trace_{widx}"
        with trace(d):
            r = track_sequence_affine(fd, x0, y0, v0, cfg)
            jax.block_until_ready(r)
        for us, nn, cat, src in op_breakdown(d, runs=1, top=400):
            key = (cat, src)
            if us > merged[key]:
                merged[key] = us
                counts[key] = nn
    rows = sorted(merged.items(), key=lambda kv: -kv[1])[:40]
    tot = sum(merged.values())
    print(f"traced total {tot / 1e3 / n_pairs:.2f} ms/frame")
    for (cat, src), us in rows:
        print(f"{us / n_pairs:9.1f} us/frame  "
              f"n={counts[(cat, src)]:7.1f}"
              f"  {cat[:60]:60s} {src[:60]}")


if __name__ == "__main__":
    main()
