"""Minimal reproducer hunt for the laptops-affine TPU-side fault.

bench.py orders the affine config LAST because a device-side fault in
that config has been observed to poison the process's TPU context
(subsequent dispatches fail).  This tool bisects: it runs the affine
pipeline in stages of increasing size/complexity and, after each
stage, probes the device with a trivial dispatch.  The first stage
whose *probe* fails is the poisoner; the exception text + stage label
are the reproducer record.

Run stages in ONE process (fault propagation is the point):
  python tools/repro_affine_fault.py            # full ladder
  python tools/repro_affine_fault.py <stage>    # single stage
"""

import os
import sys
import time
import traceback

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

import klt_tpu as klt

DATA = "/root/reference/data/images_laptops"


def probe():
    """Trivial dispatch; raises if the device context is poisoned."""
    x = jnp.ones((256, 256), jnp.float32)
    return float(jnp.sum(x @ x))


def _frames(n):
    return np.stack([klt.read_pgm(os.path.join(DATA, f"img{i}.pgm"))
                     for i in range(1, n + 1)])


def stage_affine(n_frames, n_feat, mode, levels=4, ss=2):
    from klt_tpu.runtime.pipeline import track_sequence_affine
    cfg = klt.TrackingConfig(sequential_mode=True,
                             affine_consistency_check=mode,
                             n_pyramid_levels=levels, subsampling=ss)
    frames = _frames(n_frames)
    tr = klt.KLTracker(cfg)
    fl = klt.FeatureList.create(n_feat)
    tr.select_good_features(frames[0], fl)
    r = track_sequence_affine(jnp.asarray(frames), jnp.asarray(fl.x),
                              jnp.asarray(fl.y), jnp.asarray(fl.val),
                              cfg)
    jax.block_until_ready(r)
    return int(np.sum(np.asarray(r[2])[-1] == 0))


STAGES = [
    ("affine2_small", lambda: stage_affine(3, 256, 2)),
    ("affine2_mid", lambda: stage_affine(11, 1000, 2)),
    ("affine1_mid", lambda: stage_affine(11, 1000, 1)),
    ("affine0_mid", lambda: stage_affine(11, 1000, 0)),
    ("affine2_full", lambda: stage_affine(61, 2000, 2)),
]


def main():
    only = sys.argv[1] if len(sys.argv) > 1 else None
    print(f"device: {jax.devices()[0]}", flush=True)
    assert probe() > 0
    for name, fn in STAGES:
        if only and name != only:
            continue
        t0 = time.perf_counter()
        try:
            out = fn()
            dt = time.perf_counter() - t0
            print(f"stage {name}: ok ({out} tracked, {dt:.1f}s)",
                  flush=True)
        except Exception:
            print(f"stage {name}: STAGE FAILED", flush=True)
            traceback.print_exc()
        try:
            probe()
            print(f"  probe after {name}: device healthy", flush=True)
        except Exception:
            print(f"  probe after {name}: DEVICE POISONED", flush=True)
            traceback.print_exc()
            return 1
    print("ladder complete: no poison observed", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
