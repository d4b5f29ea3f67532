"""On-chip A/B of the env-gated throughput knobs (VERDICT r3 item 3).

Measures the batched flagship config (B copies of images_provided,
150 feat) under combinations of the trace-time knobs that round 3 left
"pending on-chip A/B":

  KLT_TPU_ITER_CAP  - cap the first full-width kernel launch at J
                      Newton iterations (stragglers drain via the
                      compacted tail; bit-exact)
  KLT_TPU_P2_ROWS   - short p2 extraction canvas (12 rows measured
                      winner in round 3's manual runs)

Both are in pallas._TRACE_KNOBS, so toggling between calls retraces.
KLT_TPU_EXTRACT_TILED is import-time: pass it via the environment and
run this script twice to A/B it.

Usage: python tools/bench_knobs.py [B] [reps]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

import klt_tpu as klt
from klt_tpu.parallel.batched_lk import track_sequences_batched

DATA = "/root/reference/data/images_provided"


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 20

    klt.set_verbosity(0)
    cfg = klt.TrackingConfig(sequential_mode=True)
    frames = np.stack([klt.read_pgm(os.path.join(DATA, f"img{i}.pgm"))
                       for i in range(10)])
    tr = klt.KLTracker(cfg)
    fl = klt.FeatureList.create(150)
    tr.select_good_features(frames[0], fl)
    n_pairs = frames.shape[0] - 1

    fb = jnp.asarray(np.broadcast_to(frames, (b,) + frames.shape).copy())
    x = jnp.asarray(np.broadcast_to(fl.x, (b, 150)).copy())
    y = jnp.asarray(np.broadcast_to(fl.y, (b, 150)).copy())
    v = jnp.asarray(np.broadcast_to(fl.val, (b, 150)).copy())

    ref_out = None

    def measure(env: dict) -> float:
        saved = {}
        for k_, v_ in env.items():
            saved[k_] = os.environ.get(k_)
            os.environ[k_] = str(v_)
        try:
            @jax.jit
            def timed_run(fb, x, y, v):
                def body(i, acc):
                    xs, ys, vs = track_sequences_batched(
                        fb, x + 1e-4 * i.astype(jnp.float32), y, v, cfg)
                    return acc + xs[-1]
                return jax.lax.fori_loop(0, reps, body,
                                         jnp.zeros_like(x))

            r = timed_run(fb, x, y, v)
            np.asarray(r)  # drain: axon's async compile queue makes
            # block_until_ready a no-op until the first D2H copy
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                r = timed_run(fb, x, y, v)
                jax.block_until_ready(r)
                best = min(best, (time.perf_counter() - t0) / reps)
            # bit-exactness probe vs the baseline run (single call)
            nonlocal ref_out
            out = track_sequences_batched(fb, x, y, v, cfg)
            out = tuple(np.asarray(o) for o in out)
            if ref_out is None:
                ref_out = out
                exact = True
            else:
                exact = all(np.array_equal(a, o)
                            for a, o in zip(ref_out, out))
            # lane-0 accuracy vs the baseline run (for knobs that are
            # intentionally NOT bit-exact, e.g. EXTRACT_PREC=bf16)
            acc = ""
            if not exact and ref_out is not None:
                sag = float((out[2][:, 0] == ref_out[2][:, 0]).mean())
                both = (out[2][:, 0] >= 0) & (ref_out[2][:, 0] >= 0)
                d = np.hypot(out[0][:, 0] - ref_out[0][:, 0],
                             out[1][:, 0] - ref_out[1][:, 0])[both]
                acc = (f" status_agree={sag:.4f} "
                       f"maxd={float(d.max()) if d.size else 0:.2e}px")
            agg = b * n_pairs / best
            tag = " ".join(f"{k_}={v_}" for k_, v_ in env.items()) \
                or "baseline"
            print(f"{tag:40s} {best*1e3/n_pairs:7.3f} ms/step "
                  f"{agg:8.1f} agg_fps  bit_exact={exact}{acc}",
                  flush=True)
            return agg
        finally:
            for k_, s in saved.items():
                if s is None:
                    os.environ.pop(k_, None)
                else:
                    os.environ[k_] = s

    print(f"device={jax.devices()[0]}  B={b} reps={reps} "
          f"tiled={os.environ.get('KLT_TPU_EXTRACT_TILED', '0')}",
          flush=True)
    measure({})
    if "--prec-only" in sys.argv:
        measure({"KLT_TPU_EXTRACT_PREC": "bf16"})
        return
    if "--unroll-only" in sys.argv:
        measure({"KLT_TPU_EXTRACT_PREC": "bf16",
                 "KLT_TPU_SCAN_UNROLL": "3"})
        measure({"KLT_TPU_EXTRACT_PREC": "bf16",
                 "KLT_TPU_SCAN_UNROLL": "9"})
        return
    if "--baseline-only" in sys.argv:
        return
    measure({"KLT_TPU_EXTRACT_PREC": "bf16"})
    for cap in (1, 2, 3, 5):
        measure({"KLT_TPU_ITER_CAP": cap})
    for rows in (10, 12, 14):
        measure({"KLT_TPU_P2_ROWS": rows})
    # combos of the per-knob winners
    for cap in (1, 2, 3):
        for rows in (10, 12):
            measure({"KLT_TPU_ITER_CAP": cap, "KLT_TPU_P2_ROWS": rows})


if __name__ == "__main__":
    main()
