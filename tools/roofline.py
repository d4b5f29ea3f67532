"""Roofline / utilization evidence for the hot kernels (VERDICT item:
make "speed-of-light" measurable).

Profiles the compiled flagship frame-pair program on the real chip and
reports, per hot component:
  * pyramid kernel: achieved HBM bandwidth vs the chip peak (the
    pyramid build is bandwidth-bound by design);
  * LK level kernel: achieved useful FLOP/s vs the VPU peak;
  * extraction: BOTH achieved-GB/s-vs-HBM and logical-MAC-vs-MXU
    utilization, plus which roofline it sits under (the one-hot
    extraction matmuls are strength-reduced/materialization-bound, so
    a FLOP-only number would mislead);
  * component shares of traced device time.

The tunneled profiler DROPS whole event categories per capture window
(observed: the lk2 custom-calls vanish from some traces), so this tool
captures SEVERAL small windows and merges them by per-key maximum —
a category dropped in one window is usually present in another.

Peaks are for TPU v5e (v5 lite): ~819 GB/s HBM, VPU ~1.9 Tf32op/s,
MXU ~197 Tbf16op/s => ~65.7 Tf32op/s logical at the 3-pass (HIGH)
precision the extraction matmuls run at.

Prints one JSON line consumed by bench.py / PARITY.md.
"""

import collections
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

HBM_PEAK_GBS = 819.0
VPU_PEAK_GFLOPS = 1900.0
MXU_PEAK_GFLOPS_3PASS = 65700.0


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_comp"))
    import jax.numpy as jnp
    import numpy as np
    import klt_tpu as klt
    from klt_tpu.config import TrackingConfig
    from klt_tpu.runtime.pipeline import track_sequence
    from klt_tpu.utils.profiling import trace, op_breakdown

    klt.set_verbosity(0)
    cfg = TrackingConfig(sequential_mode=True)
    data = "/root/reference/data/images_provided"
    frames = np.stack([klt.read_pgm(os.path.join(data, f"img{i}.pgm"))
                       for i in range(10)])
    tracker = klt.KLTracker(cfg)
    fl = klt.FeatureList.create(150)
    tracker.select_good_features(frames[0], fl)
    fd = jax.device_put(frames)
    x0, y0, v0 = (jax.device_put(a) for a in (fl.x, fl.y, fl.val))

    r = track_sequence(fd, x0, y0, v0, cfg)
    jax.block_until_ready(r)
    n_pairs = frames.shape[0] - 1

    def timed(fn, reps=30):
        r = fn()
        jax.block_until_ready(r)
        t0 = time.perf_counter()
        for _ in range(reps):
            r = fn()
        jax.block_until_ready(r)
        return (time.perf_counter() - t0) / (reps * n_pairs)

    wall_per_pair = timed(lambda: track_sequence(fd, x0, y0, v0, cfg))

    # ----- ablation time budget (attribution sums to the wall by
    # construction — the tunneled profiler drops whole event
    # categories, so traced shares alone cannot account for the pair) -
    from klt_tpu.ops.pyramid import build_pyramid_stacks
    import dataclasses

    @jax.jit
    def pyr_only(fb):
        def body(carry, img):
            st = build_pyramid_stacks(img, cfg)
            probe = sum(s[0, 0, :8].sum() for s in st)
            return carry + probe, probe
        acc, _ = jax.lax.scan(body, jnp.float32(0.0), fb[1:])
        return acc

    cfg_i1 = dataclasses.replace(cfg, max_iterations=1)
    t_pyr = timed(lambda: pyr_only(fd))
    t_i1 = timed(lambda: track_sequence(fd, x0, y0, v0, cfg_i1))
    budget = {
        "pyramid_us": round(t_pyr * 1e6, 1),
        "first_iteration_round_us": round((t_i1 - t_pyr) * 1e6, 1),
        "newton_tail_us": round((wall_per_pair - t_i1) * 1e6, 1),
        "total_us": round(wall_per_pair * 1e6, 1),
        "attributed": 1.0,
    }

    # several independent small capture windows, merged by per-key MAX
    # us/run (robust to per-window event drops)
    merged = collections.defaultdict(float)
    counts = {}
    for widx in range(4):
        d = f"/tmp/roofline_trace_{widx}"
        with trace(d):
            for _ in range(2):
                r = track_sequence(fd, x0, y0, v0, cfg)
            jax.block_until_ready(r)
        for us, n, cat, src in op_breakdown(d, runs=2, top=400):
            key = (cat, src)
            if us > merged[key]:
                merged[key] = us
                counts[key] = n

    agg = {"pyramid_kernel": 0.0, "lk_kernel": 0.0, "extraction": 0.0,
           "other": 0.0}
    per_launch = {"pyramid_kernel": [], "lk_kernel": []}
    total = 0.0
    for (cat, src), us in merged.items():
        n = counts[(cat, src)]
        total += us
        if "pallas/pyramid" in src:
            agg["pyramid_kernel"] += us
            per_launch["pyramid_kernel"].append(us / max(n, 1e-9))
        elif "custom-call" in cat:
            agg["lk_kernel"] += us
            per_launch["lk_kernel"].append(us / max(n, 1e-9))
        elif "ops/interp" in src:
            agg["extraction"] += us
        else:
            agg["other"] += us

    h, w = frames.shape[1:]
    # pyramid kernel bytes per frame: reads the u8 frame, writes the
    # stacked f32 levels (3 channels each: img, gradx, grady)
    nlev, ss = cfg.n_pyramid_levels, cfg.subsampling
    bytes_out = 0
    hh, ww = h, w
    for _ in range(nlev):
        bytes_out += 3 * hh * ww * 4
        hh //= ss
        ww //= ss
    pyr_bytes = h * w + bytes_out
    pyr_us = (sum(per_launch["pyramid_kernel"]) /
              max(len(per_launch["pyramid_kernel"]), 1))
    pyr_gbs = (pyr_bytes / 1e9) / max(pyr_us, 1e-9) * 1e6

    # LK kernel useful FLOPs per launch: per Newton iteration each
    # live feature does ~40 vector ops on its (window+1)^2 x 3-channel
    # working set (conservative: counts only window-sized math)
    f = 150
    win = (cfg.window_height + 1) * 3 * (cfg.window_width + 1)
    lk_us = (sum(per_launch["lk_kernel"]) /
             max(len(per_launch["lk_kernel"]), 1))
    lk_flops_launch = f * win * 40 * 7  # ~7 iterations per launch
    lk_gflops = (lk_flops_launch / 1e9) / max(lk_us, 1e-9) * 1e6

    # Extraction analytics for the steady-state per-pair set (with the
    # sequential canvas carry the p1 windows come from the carried
    # canvas; the first-round p2 extraction per level remains): exact-
    # row one-hot band [F*k, H_l] @ [H_l, 3W_l] + block-diag column
    # one-hot [F, 3W_l, 3k] einsum.
    k = 16
    mac = 0
    by = 0.0
    hh, ww = h, w
    for _ in range(nlev):
        cw = 3 * ww
        mac += f * k * hh * cw          # row stage logical MACs
        mac += f * k * cw * 3 * k       # col stage
        by += f * k * cw * 4 * 2        # band write + read
        by += f * cw * 3 * k * 4        # col one-hot materialization
        by += f * 3 * k * k * 4         # patches out
        hh //= ss
        ww //= ss
    ex_us = agg["extraction"] / n_pairs
    ex_gflops = (2 * mac / 1e9) / max(ex_us, 1e-9) * 1e6
    ex_gbs = (by / 1e9) / max(ex_us, 1e-9) * 1e6
    pct_mxu = 100 * ex_gflops / MXU_PEAK_GFLOPS_3PASS
    pct_hbm_ex = 100 * ex_gbs / HBM_PEAK_GBS
    bound = "memory/materialization" if pct_hbm_ex >= pct_mxu else "MXU"

    device_per_pair = total / n_pairs
    out = {
        "device": str(jax.devices()[0]),
        "wall_us_per_pair": round(wall_per_pair * 1e6, 1),
        "ablation_budget": budget,
        "device_us_per_pair_traced": round(device_per_pair, 1),
        "trace_completeness": round(
            min(device_per_pair / max(wall_per_pair * 1e6, 1e-9), 1.0),
            3),
        "trace_windows_merged": 4,
        "shares_of_traced": {k2: round(v / max(total, 1e-9), 3)
                             for k2, v in agg.items()},
        "pyramid": {
            "us_per_launch": round(pyr_us, 1),
            "bytes_per_frame": pyr_bytes,
            "achieved_GB_s": round(pyr_gbs, 1),
            "pct_of_HBM_peak": round(100 * pyr_gbs / HBM_PEAK_GBS, 1),
        },
        "lk_kernel": {
            "us_per_launch": round(lk_us, 1),
            "useful_GFLOP_s_at_7iter": round(lk_gflops, 1),
            "pct_of_VPU_peak": round(100 * lk_gflops / VPU_PEAK_GFLOPS,
                                     1),
        },
        "extraction": {
            "us_per_pair": round(ex_us, 1),
            "logical_GFLOP_s": round(ex_gflops, 1),
            "pct_of_MXU_3pass_peak": round(pct_mxu, 1),
            "achieved_GB_s": round(ex_gbs, 1),
            "pct_of_HBM_peak": round(pct_hbm_ex, 1),
            "bound": bound,
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
