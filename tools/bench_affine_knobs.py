"""On-chip A/B of the affine-stage import-time knobs (VERDICT r3 item 4).

Sweeps KLT_TPU_AFFINE_RESIDENT_P (48 vs 32), KLT_TPU_AFFINE_COMPACT_PRE
(2 vs 1) and KLT_TPU_AFFINE_RESIDENT (cb vs ds) on the laptops
2000-feature affine config.  These bind at klt_tpu import, so each
combo runs in its own subprocess; the parent prints one line per combo
with throughput and parity vs the reference oracle table.

Usage:
  python tools/bench_affine_knobs.py            # parent: full sweep
  COMBO=1 ... python tools/bench_affine_knobs.py --worker [n_frames]
"""

import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

DATA = "/root/reference/data/images_laptops"


def worker(n_frames: int):
    import numpy as np
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import klt_tpu as klt
    from klt_tpu.runtime.pipeline import track_sequence_affine
    from klt_tpu.io.features_io import read_feature_table

    klt.set_verbosity(0)
    cfg = klt.TrackingConfig(sequential_mode=True,
                             affine_consistency_check=2,
                             n_pyramid_levels=4, subsampling=2)
    frames = np.stack([klt.read_pgm(os.path.join(DATA, f"img{i}.pgm"))
                       for i in range(1, n_frames + 1)])
    tr = klt.KLTracker(cfg)
    fl = klt.FeatureList.create(2000)
    tr.select_good_features(frames[0], fl)
    fd = jax.device_put(frames)
    x0, y0, v0 = (jax.device_put(a) for a in (fl.x, fl.y, fl.val))
    n_pairs = frames.shape[0] - 1

    r = track_sequence_affine(fd, x0, y0, v0, cfg)
    np.asarray(r[0])  # drain the async compile queue
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        rt = track_sequence_affine(fd, x0 + 1e-4, y0, v0, cfg)
        jax.block_until_ready(rt)
        best = min(best, (time.perf_counter() - t0) / n_pairs)

    # parity of the clean run vs the oracle table window
    here = os.path.dirname(os.path.abspath(__file__))
    oracle = read_feature_table(os.path.join(
        here, "..", "tests", "fixtures", "table_laptops_2000aff.ft"))
    xs, ys, vs = (np.asarray(a) for a in r)
    t_max = min(len(xs), oracle.x.shape[1] - 1)
    agree = total = 0
    worst = 0.0
    for t in range(t_max):
        ov = oracle.val[:, 1 + t]
        agree += int(((vs[t] >= 0) == (ov >= 0)).sum())
        total += len(ov)
        both = (vs[t] >= 0) & (ov >= 0)
        if both.any():
            d = np.hypot(xs[t] - oracle.x[:, 1 + t],
                         ys[t] - oracle.y[:, 1 + t])[both]
            worst = max(worst, float(d.max()))
    print(f"RESULT fps={1.0/best:.1f} agree={agree/total:.4f} "
          f"max_drift={worst:.3f} live={(vs[-1] >= 0).sum()}",
          flush=True)


def main():
    if "--worker" in sys.argv:
        n = int(sys.argv[-1]) if sys.argv[-1].isdigit() else 60
        worker(n)
        return
    n_frames = sys.argv[1] if len(sys.argv) > 1 else "60"
    combos = [
        {"KLT_TPU_AFFINE_RESIDENT_P": "32",
         "KLT_TPU_AFFINE_REPAIR_P": "96"},
        {"KLT_TPU_AFFINE_RESIDENT_P": "32",
         "KLT_TPU_AFFINE_REPAIR_P": "128"},
        {"KLT_TPU_AFFINE_RESIDENT_P": "32",
         "KLT_TPU_AFFINE_REPAIR_P": "96",
         "KLT_TPU_AFFINE_COMPACT_M": "64"},
        {"KLT_TPU_AFFINE_RESIDENT_P": "32",
         "KLT_TPU_AFFINE_REPAIR_P": "96",
         "KLT_TPU_AFFINE_COMPACT_M": "32"},
    ]
    for combo in combos:
        env = dict(os.environ)
        env.update(combo)
        tag = " ".join(f"{k.replace('KLT_TPU_', '')}={v}"
                       for k, v in combo.items()) or "baseline"
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--worker",
             n_frames],
            capture_output=True, text=True, env=env, timeout=1800)
        line = [l for l in r.stdout.splitlines()
                if l.startswith("RESULT")]
        print(f"{tag:34s} {line[0][7:] if line else 'FAILED'}",
              flush=True)
        if not line:
            print(r.stdout[-1500:], r.stderr[-1500:], flush=True)


if __name__ == "__main__":
    main()
