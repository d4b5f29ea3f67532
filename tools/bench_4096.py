"""On-chip A/B for the 4096-feature config (VERDICT r3 item 6).

The 3x4096 concurrent config is extraction-materialization-bound
(~51 fps = ~16x in round 3).  Sweeps the extraction levers aimed at
exactly that wall:

  KLT_TPU_EXTRACT_PREC=bf16  (trace-time: single-pass + bf16 band)
  KLT_TPU_EXTRACT_TILED=1    (import-time: column-tiled bands)

Import-time knobs run in subprocesses; within one subprocess the
trace-time knob toggles in-process.

Usage: python tools/bench_4096.py          # parent sweep
       python tools/bench_4096.py --worker # one (env-decided) combo
"""

import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np

DATA = "/root/reference/data"


def worker():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import klt_tpu as klt
    from klt_tpu.parallel.batched_lk import track_sequences_batched

    klt.set_verbosity(0)
    cfg = klt.TrackingConfig(sequential_mode=True)
    t_frames = 10
    n = 4096
    seqs, xs, ys, vs = [], [], [], []
    for name, lo in (("images_provided", 0), ("images_traffic", 1),
                     ("images_laptops", 1)):
        fr = np.stack([klt.read_pgm(os.path.join(
            DATA, name, f"img{i}.pgm")) for i in range(lo, lo + t_frames)])
        tr = klt.KLTracker(cfg)
        fl = klt.FeatureList.create(n)
        tr.select_good_features(fr[0], fl)
        xs.append(fl.x)
        ys.append(fl.y)
        vs.append(fl.val)
        ph, pw = 480 - fr.shape[1], 640 - fr.shape[2]
        seqs.append(np.pad(fr, ((0, 0), (0, ph), (0, pw))))
    frames = np.stack(seqs)
    x = jnp.asarray(np.stack(xs))
    y = jnp.asarray(np.stack(ys))
    v = jnp.asarray(np.stack(vs))
    fd = jax.device_put(frames)
    reps = 3

    ref = None
    for prec in ("high", "bf16"):
        os.environ["KLT_TPU_EXTRACT_PREC"] = prec

        @jax.jit
        def timed_run(fd, x, y, v):
            def body(i, acc):
                xs_, ys_, vs_ = track_sequences_batched(
                    fd, x + 1e-4 * i.astype(jnp.float32), y, v, cfg)
                return acc + xs_[-1]
            return jax.lax.fori_loop(0, reps, body, jnp.zeros_like(x))

        r = timed_run(fd, x, y, v)
        np.asarray(r)  # drain async compile queue
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            r = timed_run(fd, x, y, v)
            jax.block_until_ready(r)
            best = min(best, (time.perf_counter() - t0) / reps)
        agg = 3 * (t_frames - 1) / best
        out = tuple(np.asarray(o) for o in
                    track_sequences_batched(fd, x, y, v, cfg))
        acc = ""
        if ref is None:
            ref = out
        else:
            sag = float((out[2][:, 0] == ref[2][:, 0]).mean())
            both = (out[2][:, 0] >= 0) & (ref[2][:, 0] >= 0)
            d = np.hypot(out[0][:, 0] - ref[0][:, 0],
                         out[1][:, 0] - ref[1][:, 0])[both]
            acc = (f" status_agree={sag:.4f} "
                   f"maxd={float(d.max()) if d.size else 0:.2e}px")
        print(f"RESULT tiled={os.environ.get('KLT_TPU_EXTRACT_TILED','0')}"
              f" prec={prec} agg_fps={agg:.1f}{acc}", flush=True)


def main():
    if "--worker" in sys.argv:
        worker()
        return
    for tiled in ("0", "1"):
        env = dict(os.environ)
        env["KLT_TPU_EXTRACT_TILED"] = tiled
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--worker"],
            capture_output=True, text=True, env=env, timeout=3000)
        for line in r.stdout.splitlines():
            if line.startswith("RESULT"):
                print(line[7:], flush=True)
        if "RESULT" not in r.stdout:
            print(f"tiled={tiled} FAILED", r.stdout[-800:],
                  r.stderr[-800:], flush=True)


if __name__ == "__main__":
    main()
