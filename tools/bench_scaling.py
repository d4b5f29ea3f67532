"""Multi-sequence / multi-chip scaling benchmark.

Tracks B copies of the images_provided sequence as a sharded batch over
the available device mesh and reports aggregate frames/s + per-device
efficiency.  On a 1-chip host this measures batch throughput; on a pod
slice it measures data-parallel scaling (the BASELINE.json >=80%
efficiency target).  Use JAX_PLATFORMS=cpu with
XLA_FLAGS=--xla_force_host_platform_device_count=8 for a functional
(not perf) multi-device check.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


def main():
    import jax
    import jax.numpy as jnp
    import klt_tpu as klt
    from klt_tpu.config import TrackingConfig
    from klt_tpu.parallel.mesh import make_mesh
    from klt_tpu.parallel.batch import make_batch_step

    klt.set_verbosity(0)
    cfg = TrackingConfig(sequential_mode=True)
    data = "/root/reference/data/images_provided"
    frames = np.stack([klt.read_pgm(os.path.join(data, f"img{i}.pgm"))
                       for i in range(10)])
    tracker = klt.KLTracker(cfg)
    fl = klt.FeatureList.create(150)
    tracker.select_good_features(frames[0], fl)

    n_dev = len(jax.devices())
    mesh = make_mesh({"data": n_dev}) if n_dev > 1 else None
    step = make_batch_step(cfg, mesh)
    n_pairs = frames.shape[0] - 1
    reps = 5

    results = {}
    for per_dev in (1, 2, 4):
        b = per_dev * n_dev
        fb = np.broadcast_to(frames, (b,) + frames.shape).copy()
        xb = np.broadcast_to(fl.x, (b, 150)).copy()
        yb = np.broadcast_to(fl.y, (b, 150)).copy()
        vb = np.broadcast_to(fl.val, (b, 150)).copy()

        def run():
            x, y, v = jnp.asarray(xb), jnp.asarray(yb), jnp.asarray(vb)
            for _ in range(reps):
                for t in range(n_pairs):
                    x, y, v = step(jnp.asarray(fb[:, t]),
                                   jnp.asarray(fb[:, t + 1]), x, y, v)
            jax.block_until_ready((x, y, v))

        run()  # warmup/compile
        t0 = time.perf_counter()
        run()
        dt = time.perf_counter() - t0
        fps = reps * n_pairs * b / dt
        results[b] = fps
        print(f"B={b:3d} ({n_dev} devices): {fps:9.1f} frames/s aggregate")

    base = results[n_dev] / n_dev
    print(f"per-device at B={n_dev}: {base:.1f} frames/s")


if __name__ == "__main__":
    main()
