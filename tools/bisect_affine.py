"""Frame-by-frame bisect of the laptops-affine config vs the reference
oracle table (tests/fixtures/table_laptops_2000aff.ft).

Finds the first (frame, feature) where the repo's status or position
diverges from the reference CPU run, then dumps that feature's history
on both sides — the root-cause probe for VERDICT r3 item #1.

Usage:
  python tools/bisect_affine.py [n_frames] [n_feat]
  JAX_PLATFORMS=cpu python tools/bisect_affine.py 12 2000
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

import klt_tpu as klt
from klt_tpu.io.features_io import read_feature_table
from klt_tpu.runtime.pipeline import track_sequence_affine

DATA = "/root/reference/data/images_laptops"
HERE = os.path.dirname(os.path.abspath(__file__))
ORACLE = os.path.join(HERE, "..", "tests", "fixtures",
                      "table_laptops_2000aff.ft")


def main():
    n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    n_feat = int(sys.argv[2]) if len(sys.argv) > 2 else 2000

    cfg = klt.TrackingConfig(sequential_mode=True,
                             affine_consistency_check=2,
                             n_pyramid_levels=4, subsampling=2)
    frames = np.stack([klt.read_pgm(os.path.join(DATA, f"img{i}.pgm"))
                       for i in range(1, n_frames + 1)])
    tr = klt.KLTracker(cfg)
    fl = klt.FeatureList.create(n_feat)
    tr.select_good_features(frames[0], fl)

    oracle = read_feature_table(ORACLE)
    ox, oy, ov = oracle.x, oracle.y, oracle.val

    # seed parity
    d0 = np.hypot(fl.x - ox[:n_feat, 0], fl.y - oy[:n_feat, 0])
    print(f"seed: max |dx| vs oracle col0 = {d0.max():.2e}")

    r = track_sequence_affine(jnp.asarray(frames), jnp.asarray(fl.x),
                              jnp.asarray(fl.y), jnp.asarray(fl.val), cfg)
    xs, ys, vs = (np.asarray(a) for a in r)

    first_bad = None
    for t in range(n_frames - 1):
        c = 1 + t
        live_r = vs[t] >= 0
        live_o = ov[:n_feat, c] >= 0
        smis = live_r != live_o
        both = live_r & live_o
        d = np.hypot(xs[t] - ox[:n_feat, c], ys[t] - oy[:n_feat, c])
        pmis = both & (d > 0.5)
        print(f"t={t}: live repo={live_r.sum()} oracle={live_o.sum()} "
              f"status_mismatch={smis.sum()} pos>0.5px={pmis.sum()} "
              f"median_d={np.median(d[both]):.2e} "
              f"max_d={d[both].max():.3f}")
        bad = np.nonzero(smis | pmis)[0]
        if len(bad) and first_bad is None:
            first_bad = (t, bad[:12])

    if first_bad is None:
        print("NO divergence found")
        return

    t, feats = first_bad
    print(f"\nfirst divergence at t={t} (frame {t+2}), features "
          f"{list(feats)}")
    for i in feats[:6]:
        print(f"\n-- feature {i}: seed=({fl.x[i]:.4f},{fl.y[i]:.4f})")
        for u in range(max(0, t - 2), min(n_frames - 1, t + 3)):
            c = 1 + u
            print(f"   t={u}: repo=({xs[u][i]:9.4f},{ys[u][i]:9.4f},"
                  f"v={vs[u][i]:3d})  oracle=({ox[i, c]:9.4f},"
                  f"{oy[i, c]:9.4f},v={ov[i, c]:3d})")


if __name__ == "__main__":
    main()
