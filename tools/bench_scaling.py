"""Multi-sequence / multi-chip scaling benchmark.

Tracks B copies of the images_provided sequence as a sharded batch over
the available device mesh and reports aggregate frames/s + batch-scaling
efficiency.  On a 1-chip host this measures batch throughput; on a pod
slice it measures data-parallel scaling (the BASELINE.json >=80%
efficiency target).  Use JAX_PLATFORMS=cpu with
XLA_FLAGS=--xla_force_host_platform_device_count=8 for a functional
(not perf) multi-device check.

The whole sequence runs as ONE device-resident scanned dispatch per
batch size (parallel.batched_lk.track_sequences_batched) so the number
measured is tracking throughput, not host dispatch latency.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


def run_scaling(per_dev_batches=(1, 2, 4), reps=None, emit=print):
    # reps amortize the ~30-60 ms dispatch latency of the tunneled TPU;
    # each rep is one whole-sequence scanned dispatch.  On the CPU mesh
    # the run is a functional (not perf) check, so keep it short.
    import jax
    import jax.numpy as jnp
    import klt_tpu as klt
    from klt_tpu.config import TrackingConfig
    from klt_tpu.parallel.mesh import make_mesh
    from klt_tpu.parallel.batch import track_batch

    klt.set_verbosity(0)
    cfg = TrackingConfig(sequential_mode=True)
    data = "/root/reference/data/images_provided"
    frames = np.stack([klt.read_pgm(os.path.join(data, f"img{i}.pgm"))
                       for i in range(10)])
    tracker = klt.KLTracker(cfg)
    fl = klt.FeatureList.create(150)
    tracker.select_good_features(frames[0], fl)

    n_dev = len(jax.devices())
    if reps is None:
        reps = 25 if jax.devices()[0].platform != "cpu" else 2
    mesh = make_mesh({"data": n_dev}) if n_dev > 1 else None
    n_pairs = frames.shape[0] - 1

    results = {}
    for per_dev in per_dev_batches:
        b = per_dev * n_dev
        fb = jnp.asarray(np.broadcast_to(
            frames, (b,) + frames.shape).copy())
        xb = jnp.asarray(np.broadcast_to(fl.x, (b, 150)).copy())
        yb = jnp.asarray(np.broadcast_to(fl.y, (b, 150)).copy())
        vb = jnp.asarray(np.broadcast_to(fl.val, (b, 150)).copy())

        def run():
            out = None
            for _ in range(reps):
                out = track_batch(fb, xb, yb, vb, cfg, mesh=mesh)
            jax.block_until_ready(out)
            return out

        out = run()  # warmup/compile
        np.asarray(out[0])  # drain the async compile queue
        t0 = time.perf_counter()
        run()
        dt = time.perf_counter() - t0
        fps = reps * n_pairs * b / dt
        results[b] = fps
        emit(f"B={b:3d} ({n_dev} devices): {fps:9.1f} frames/s aggregate")

    b_min = min(results)
    base = results[b_min] / b_min  # per-sequence fps at the small batch
    eff = {b: results[b] / (b * base) for b in results}
    for b in sorted(results):
        emit(f"B={b:3d}: batch-scaling efficiency "
             f"{100.0 * eff[b]:5.1f}% vs B={b_min}")
    return {
        "n_devices": n_dev,
        "aggregate_fps": {str(b): round(v, 1) for b, v in results.items()},
        "batch_scaling_efficiency": {str(b): round(v, 4)
                                     for b, v in eff.items()},
    }


def main():
    if os.environ.get("KLT_FORCE_CPU") == "1":
        # the axon sitecustomize force-registers the TPU platform and
        # ignores JAX_PLATFORMS; override back to the virtual CPU mesh
        # and RESET the backend (a config update alone is ignored once
        # the plugin backend exists — same recipe as dryrun_multichip)
        import jax
        try:
            jax.config.update("jax_num_cpu_devices", 8)
        except Exception:
            pass
        jax.config.update("jax_platforms", "cpu")
        import jax.extend.backend as _jeb
        _jeb.clear_backends()
        if jax.devices()[0].platform != "cpu":
            print(json.dumps({"error": "could not force CPU mesh"}))
            return
    out = run_scaling()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
