"""Example: tracking-to-mapping pipeline (beyond-reference extension).

Runs the KLT tracker over a PGM sequence, converts the feature table to
observation chains, selects keyframes by feature overlap, and refines a
bundle-adjustment problem (poses + landmarks) from the tracks.

Monocular initialization here is deliberately simple (identity poses,
unit-depth back-projection) — the point of the example is the data flow
FeatureTable -> chains -> keyframes -> distributed BA; see
tests/test_slam.py for BA accuracy validation on synthetic geometry.

Usage:
    python examples/slam_pipeline.py [dataset] [nFeatures] [nFrames]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import klt_tpu as klt  # noqa: E402
from klt_tpu.io.dataset import find_dataset, ImageSequence  # noqa: E402
from klt_tpu.slam import (tracks_from_table, select_keyframes,  # noqa: E402
                          BAProblem, bundle_adjust)


def main():
    dataset = sys.argv[1] if len(sys.argv) > 1 else "images_provided"
    n_features = int(sys.argv[2]) if len(sys.argv) > 2 else 150
    n_frames = int(sys.argv[3]) if len(sys.argv) > 3 else 10

    path = find_dataset(dataset)
    if path is None:
        sys.exit(f"dataset '{dataset}' not found")
    seq = ImageSequence(path)
    n_frames = min(n_frames, len(seq))

    cfg = klt.TrackingConfig(sequential_mode=True)
    tracker = klt.KLTracker(cfg)
    fl = klt.FeatureList.create(n_features)
    ft = klt.FeatureTable.create(n_frames, n_features)

    img1 = seq[0]
    tracker.select_good_features(img1, fl)
    ft.store_list(fl, 0)
    for i in range(1, n_frames):
        img2 = seq[i]
        tracker.track_features(img1, img2, fl)
        tracker.replace_lost_features(img2, fl)
        ft.store_list(fl, i)
        img1 = img2

    # front-end -> back-end handoff
    tid, frame, u, v = tracks_from_table(ft.x, ft.y, ft.val, min_length=3)
    if len(tid) == 0:
        sys.exit("no tracks of length >= 3; nothing to adjust")
    kfs = select_keyframes(ft.val, overlap_thresh=0.8)
    if len(kfs) < 3:
        # short well-tracked clip: take evenly spaced keyframes so the
        # BA demo has multiple views
        kfs = np.arange(0, n_frames, max(1, n_frames // 4), dtype=np.int32)
    print(f"{tid.max() + 1} tracks / {len(tid)} observations; "
          f"keyframes: {[int(k) for k in kfs]}")

    # keep observations on keyframes only, remap frame -> pose index
    kf_set = {int(f): i for i, f in enumerate(kfs)}
    keep = np.isin(frame, kfs)
    tid, frame, u, v = tid[keep], frame[keep], u[keep], v[keep]
    # tracks must appear on >= 2 keyframes to constrain anything
    ids, counts = np.unique(tid, return_counts=True)
    keep = np.isin(tid, ids[counts >= 2])
    tid, frame, u, v = tid[keep], frame[keep], u[keep], v[keep]
    remap = {old: new for new, old in enumerate(np.unique(tid))}
    lm_idx = np.asarray([remap[t] for t in tid], np.int32)
    cam_idx = np.asarray([kf_set[int(f)] for f in frame], np.int32)

    if len(lm_idx) == 0:
        sys.exit("no multi-keyframe tracks; nothing to adjust")
    n_pose = len(kfs)
    n_lm = int(lm_idx.max()) + 1
    h, w = seq.nrows, seq.ncols
    fx = fy = 0.9 * w
    cx, cy = w / 2.0, h / 2.0

    # unit-depth back-projection from each landmark's first observation
    lm0 = np.zeros((n_lm, 3), np.float32)
    seen = np.zeros(n_lm, bool)
    for m in range(len(lm_idx)):
        l = lm_idx[m]
        if not seen[l]:
            lm0[l] = [(u[m] - cx) / fx, (v[m] - cy) / fy, 1.0]
            seen[l] = True

    prob = BAProblem(
        R=jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32),
                           (n_pose, 3, 3)).copy(),
        t=jnp.zeros((n_pose, 3), jnp.float32),
        landmarks=jnp.asarray(lm0),
        cam_idx=jnp.asarray(cam_idx), lm_idx=jnp.asarray(lm_idx),
        uv=jnp.asarray(np.stack([u, v], -1).astype(np.float32)),
        weight=jnp.ones(len(cam_idx), jnp.float32),
        fx=fx, fy=fy, cx=cx, cy=cy)

    R, t, lm, costs = bundle_adjust(prob, iterations=20)
    costs = np.asarray(costs)
    rms0 = float(np.sqrt(costs[0] / max(len(cam_idx), 1)))
    rms1 = float(np.sqrt(costs[-1] / max(len(cam_idx), 1)))
    print(f"BA: {n_pose} keyframes x {n_lm} landmarks, "
          f"{len(cam_idx)} observations")
    print(f"reprojection rms: {rms0:.3f} -> {rms1:.3f} px")


if __name__ == "__main__":
    main()
