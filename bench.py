"""Benchmark: KLT tracking throughput + accuracy vs the CPU reference.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

Primary metric mirrors the reference's own harness (clock() around
KLTTrackFeatures only, src/V3/example3GPU.c:61-65) on its profiled
config: images_provided, 150 features, 2-level pyramid, sequential mode.
Baseline: 11.85 ms per frame-pair on the reference CPU
(src/V1/example3_analysis.txt:46) = 84.39 frames/s.

The timing loop repeats the whole-sequence device program with a
perturbed start each repetition so XLA cannot hoist the work out of the
repeat loop; elapsed time is measured around a single dispatch
(dispatch latency to the tunneled TPU is ~60 ms, so per-pair cost must
be amortized on device).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

CPU_BASELINE_FPS = 1.0 / 0.01185  # reference: 11.85 ms / frame-pair


def main():
    import jax
    import jax.numpy as jnp
    import klt_tpu as klt
    from klt_tpu.runtime.pipeline import track_sequence
    from klt_tpu.io.features_io import read_feature_table

    klt.set_verbosity(0)
    cfg = klt.TrackingConfig(sequential_mode=True)

    data = "/root/reference/data/images_provided"
    frames = np.stack([klt.read_pgm(os.path.join(data, f"img{i}.pgm"))
                       for i in range(10)])

    # Selection (one-time, like the reference example3).
    tracker = klt.KLTracker(cfg)
    fl = klt.FeatureList.create(150)
    tracker.select_good_features(frames[0], fl)

    frames_dev = jax.device_put(frames)
    x0 = jax.device_put(fl.x)
    y0 = jax.device_put(fl.y)
    v0 = jax.device_put(fl.val)

    n_pairs = frames.shape[0] - 1
    reps = 100

    @jax.jit
    def timed_run(frames, x, y, v):
        def body(i, acc):
            xs, ys, vs = track_sequence(frames, x + 1e-4 * i, y, v, cfg)
            return acc + xs[-1]
        return jax.lax.fori_loop(0, reps, body, jnp.zeros_like(x))

    r = timed_run(frames_dev, x0, y0, v0)
    jax.block_until_ready(r)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        r = timed_run(frames_dev, x0, y0, v0)
        jax.block_until_ready(r)
        best = min(best, (time.perf_counter() - t0) / (reps * n_pairs))
    fps = 1.0 / best

    # Accuracy vs the committed golden table (unperturbed run).
    tables = track_sequence(frames_dev, x0, y0, v0, cfg)
    jax.block_until_ready(tables)
    drift_px = None
    status_agree = None
    golden = "/root/reference/src/V1/feat/features2.ft"
    if os.path.exists(golden):
        xs, ys, vs = (np.asarray(t) for t in tables)
        oracle = read_feature_table(golden)
        dmax = 0.0
        agree = 0
        total = 0
        for t in range(n_pairs):
            ox, oy, ov = oracle.x[:, t], oracle.y[:, t], oracle.val[:, t]
            agree += int((vs[t] == ov).sum())
            total += len(ov)
            both = (vs[t] >= 0) & (ov >= 0)
            if both.any():
                d = np.hypot(xs[t] - ox, ys[t] - oy)[both]
                dmax = max(dmax, float(d.max()))
        drift_px = dmax
        status_agree = agree / total

    result = {
        "metric": "track_frames_per_s (images_provided, 150 feat, "
                  "2-level pyramid, 1 chip)",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / CPU_BASELINE_FPS, 2),
        "drift_px_vs_cpu_golden": drift_px,
        "status_agreement": status_agree,
        "device": str(jax.devices()[0]),
    }

    # Secondary: the reference's own GPU benchmark config — 640x480
    # traffic sequence (src/V3/example3GPU.c CLI), timed the same way
    # (track only; one long device program amortizes dispatch).
    traffic = "/root/reference/data/images_traffic"
    if os.path.isdir(traffic):
        n_fr = 200
        fr = np.stack([klt.read_pgm(os.path.join(traffic,
                                                 f"img{i}.pgm"))
                       for i in range(1, n_fr + 1)])
        tr2 = klt.KLTracker(cfg)
        fl2 = klt.FeatureList.create(150)
        tr2.select_good_features(fr[0], fl2)
        fr_dev = jax.device_put(fr)
        a0 = jax.device_put(fl2.x)
        b0 = jax.device_put(fl2.y)
        c0 = jax.device_put(fl2.val)

        out = track_sequence(fr_dev, a0, b0, c0, cfg)
        jax.block_until_ready(out)
        best_t = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = track_sequence(fr_dev, a0 + 1e-4, b0, c0, cfg)
            jax.block_until_ready(out)
            best_t = min(best_t, (time.perf_counter() - t0) / (n_fr - 1))
        result["traffic_640x480_frames_per_s"] = round(1.0 / best_t, 2)

    print(json.dumps(result))


if __name__ == "__main__":
    main()
