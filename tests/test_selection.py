"""Feature selection vs the CPU oracle + native runtime unit tests."""

import numpy as np

import klt_tpu as klt
from klt_tpu import native
from conftest import load_xyv


def test_native_sort_descending_and_permutation():
    rng = np.random.RandomState(7)
    pts = np.stack([rng.randint(0, 100, 5000),
                    rng.randint(0, 100, 5000),
                    rng.randint(0, 50, 5000)], axis=1).astype(np.int32)
    orig = pts.copy()
    native.sort_points_desc(pts)
    assert np.all(np.diff(pts[:, 2]) <= 0)
    # same multiset of rows
    a = orig[np.lexsort(orig.T)]
    b = pts[np.lexsort(pts.T)]
    np.testing.assert_array_equal(a, b)


def test_native_suppression_min_distance():
    rng = np.random.RandomState(3)
    n = 2000
    pts = np.stack([rng.randint(0, 200, n), rng.randint(0, 150, n),
                    rng.randint(1, 10000, n)], axis=1).astype(np.int32)
    native.sort_points_desc(pts)
    fx = np.full(100, -1.0, np.float32)
    fy = np.full(100, -1.0, np.float32)
    fval = np.full(100, -1, np.int32)
    native.min_dist_suppress(pts, fx, fy, fval, 200, 150, mindist=10,
                             min_eigenvalue=1, overwrite_all=True)
    sel = fval >= 0
    xs, ys = fx[sel], fy[sel]
    # pairwise Chebyshev distance >= mindist-1 honoring the reference's
    # mindist-- convention (src/V1/selectGoodFeatures.c:157)
    for i in range(len(xs)):
        d = np.maximum(np.abs(xs - xs[i]), np.abs(ys - ys[i]))
        d[i] = 1e9
        assert d.min() > 9


def test_selection_matches_oracle(provided_frames):
    tr = klt.KLTracker(klt.TrackingConfig())
    fl = klt.FeatureList.create(150)
    tr.select_good_features(provided_frames[0], fl)

    ox, oy, ov = load_xyv("select_img0.xyv")
    pos_match = (fl.x == ox) & (fl.y == oy)
    # float rounding at the int-truncation boundary may swap an occasional
    # tie pair; require near-perfect agreement.
    assert pos_match.sum() >= 148, f"only {pos_match.sum()}/150 matched"
    # responses of matching features agree within 1 count
    assert np.all(np.abs(fl.val[pos_match] - ov[pos_match]) <= 1)


def test_replacement_keeps_live_features(provided_frames):
    tr = klt.KLTracker(klt.TrackingConfig())
    fl = klt.FeatureList.create(100)
    tr.select_good_features(provided_frames[0], fl)
    # kill 30 features
    kill = np.arange(0, 100, 3)
    fl.val[kill] = klt.OOB
    fl.x[kill] = fl.y[kill] = -1.0
    keep_x = fl.x.copy()
    tr.replace_lost_features(provided_frames[0], fl)
    live = np.setdiff1d(np.arange(100), kill)
    np.testing.assert_array_equal(fl.x[live], keep_x[live])
    assert fl.count_remaining() > 70  # killed slots mostly refilled
    # refilled features respect min distance from kept ones
    sel = fl.val >= 0
    xs, ys = fl.x[sel], fl.y[sel]
    for i in range(len(xs)):
        d = np.maximum(np.abs(xs - xs[i]), np.abs(ys - ys[i]))
        d[i] = 1e9
        assert d.min() > tr.cfg.mindist - 1
