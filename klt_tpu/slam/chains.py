"""Feature-table post-processing: observation chains + keyframes.

The reference's FeatureTable is an nFeatures x nFrames grid of
(x, y, val) records (src/V1/klt.c:210-236); a feature's *chain* is the
maximal run of frames where val >= 0 starting from a (re)selection
event (val > 0 marks a fresh detection, val == 0 a successful track —
src/V1/klt.h:28-33 semantics as used by storeFeatures).

These helpers are host-side (NumPy): they run once per sequence and
feed the device-side bundle adjustment with dense index arrays.
"""

from __future__ import annotations

import numpy as np


def tracks_from_table(x, y, val, min_length: int = 2):
    """Extract observation chains from a feature table.

    x, y, val: [N, T] arrays (feature-major, like KLT_FeatureTable).
    Returns (track_id [M], frame [M], u [M], v [M]) observation lists
    where M spans every (feature, frame) with val >= 0, with a new
    track id opened at every fresh detection (val > 0) and tracks
    shorter than `min_length` dropped.
    """
    x = np.asarray(x)
    y = np.asarray(y)
    val = np.asarray(val)
    n, t = val.shape
    tid, frame, us, vs = [], [], [], []
    next_id = 0
    for i in range(n):
        cur = -1
        cur_len = 0
        cur_start = 0
        for j in range(t):
            if val[i, j] < 0:
                cur = -1
                continue
            if val[i, j] > 0 or cur < 0:
                cur = next_id
                next_id += 1
            tid.append(cur)
            frame.append(j)
            us.append(x[i, j])
            vs.append(y[i, j])
    tid = np.asarray(tid, np.int32)
    frame = np.asarray(frame, np.int32)
    us = np.asarray(us, np.float32)
    vs = np.asarray(vs, np.float32)
    # drop short tracks and renumber densely
    ids, counts = np.unique(tid, return_counts=True)
    keep_ids = ids[counts >= min_length]
    keep = np.isin(tid, keep_ids)
    tid, frame, us, vs = tid[keep], frame[keep], us[keep], vs[keep]
    remap = {old: new for new, old in enumerate(np.unique(tid))}
    tid = np.asarray([remap[t_] for t_ in tid], np.int32)
    return tid, frame, us, vs


def select_keyframes(val, overlap_thresh: float = 0.6,
                     min_gap: int = 1):
    """Greedy keyframe selection by tracked-feature overlap.

    val: [N, T].  Frame 0 is always a keyframe; a new keyframe is
    opened when the fraction of the last keyframe's live features still
    tracked drops below `overlap_thresh` (or every `min_gap` frames at
    most... at least).  Returns sorted frame indices.
    """
    val = np.asarray(val)
    n, t = val.shape
    keyframes = [0]
    ref_alive = val[:, 0] >= 0
    for j in range(1, t):
        alive = val[:, j] >= 0
        ref_count = max(int(ref_alive.sum()), 1)
        overlap = float((ref_alive & alive).sum()) / ref_count
        if overlap < overlap_thresh and j - keyframes[-1] >= min_gap:
            keyframes.append(j)
            ref_alive = alive
    return np.asarray(keyframes, np.int32)
