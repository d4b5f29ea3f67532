"""A/B harness: jnp reference path vs Pallas kernel path.

The TPU analogue of the reference's `make run_cpu` / `make run_gpu`
twin-binary workflow (src/V3/Makefile:84-92): run the same selection +
tracking flow through both implementations and diff the feature tables.

Usage:
    python tools/ab_compare.py [dataset] [nFeatures] [nFrames]
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


def run(dataset: str, n_features: int, n_frames: int):
    import jax
    import jax.numpy as jnp
    import klt_tpu as klt
    from klt_tpu.config import TrackingConfig
    import klt_tpu.runtime.pipeline as pipeline
    from klt_tpu.io.dataset import load_sequence_array

    klt.set_verbosity(0)
    cfg = TrackingConfig(sequential_mode=True)
    seq = load_sequence_array(dataset, n_frames)
    if seq is None:
        sys.exit(f"dataset '{dataset}' not found")

    tracker = klt.KLTracker(cfg)
    fl = klt.FeatureList.create(n_features)
    tracker.select_good_features(seq[0], fl)
    args = (jnp.asarray(seq), jnp.asarray(fl.x), jnp.asarray(fl.y),
            jnp.asarray(fl.val))

    fast = pipeline.track_sequence(*args, cfg)
    jax.block_until_ready(fast)

    # the pipeline wrappers key the jit cache on the pallas decision
    # (pallas.pallas_key), so the env toggle retraces — no need to
    # bypass the cached entry
    os.environ["KLT_TPU_NO_PALLAS"] = "1"
    slow = pipeline.track_sequence(*args, cfg)
    jax.block_until_ready(slow)
    del os.environ["KLT_TPU_NO_PALLAS"]

    fx, fy, fv = (np.asarray(t) for t in fast)
    sx, sy, sv = (np.asarray(t) for t in slow)
    agree = float((fv == sv).mean())
    both = (fv >= 0) & (sv >= 0)
    d = np.hypot(fx - sx, fy - sy)[both]
    dmax = float(d.max()) if d.size else 0.0
    print(f"{dataset}: {seq.shape[0] - 1} pairs x {n_features} features")
    print(f"status agreement pallas-vs-jnp: {agree:.6f}")
    print(f"tracked-position max diff:      {dmax:.3e} px")
    ok = agree == 1.0 and dmax < 1e-3
    print("A/B OK" if ok else "A/B MISMATCH")
    return 0 if ok else 1


if __name__ == "__main__":
    ds = sys.argv[1] if len(sys.argv) > 1 else "images_provided"
    nf = int(sys.argv[2]) if len(sys.argv) > 2 else 150
    nfr = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    sys.exit(run(ds, nf, nfr))
