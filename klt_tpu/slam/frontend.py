"""Front-end -> pose-graph -> bundle-adjustment assembly.

The missing middle of the tracking-to-mapping pipeline: derive RELATIVE
pose measurements between consecutive keyframes from their shared
tracks (each via a tiny two-pose bundle adjustment on padded, fixed
shapes so one compiled program serves every pair), chain them through
the SE(3) pose graph (slam/pose_graph.py), and hand the refined
absolute poses to the full bundle adjustment as its initialization.
All geometry comes from the tracked features themselves — no external
odometry.
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np
import jax
import jax.numpy as jnp

from .ba import BAProblem, bundle_adjust, _gn_step, _total_cost
from .pose_graph import PoseGraph, optimize_pose_graph
from .chains import ba_translation_prior


def _pair_core(fx, fy, cx, cy, iters):
    """Two-pose Levenberg-Marquardt solve body (unjitted; see the
    cached jit wrappers below).  The LM accept/reject is load-bearing:
    plain damped Gauss-Newton diverges (NaN) on real pairs with
    near-degenerate shared geometry."""

    def run(t0, lm0, cam_idx, lm_idx, uv, weight):
        prob = BAProblem(
            R=jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32),
                               (2, 3, 3)),
            t=t0, landmarks=lm0, cam_idx=cam_idx, lm_idx=lm_idx,
            uv=uv, weight=weight, fx=fx, fy=fy, cx=cx, cy=cy)
        c0 = _total_cost(prob.R, t0, lm0, prob)

        def body(carry, _):
            R, t, lm, lam, c_cur = carry
            Rn, tn, lmn, _ = _gn_step(R, t, lm, prob, None, lam, True)
            c_new = _total_cost(Rn, tn, lmn, prob)
            ok = (c_new < c_cur) & jnp.isfinite(c_new)
            sel = lambda a, b: jnp.where(ok, a, b)
            R = jnp.where(ok, Rn, R)
            t = sel(tn, t)
            lm = sel(lmn, lm)
            lam = jnp.where(ok, jnp.maximum(lam * 0.5, 1e-6),
                            lam * 4.0)
            c_cur = sel(c_new, c_cur)
            return (R, t, lm, lam, c_cur), c_cur

        (R, t, lm, _, _), _ = jax.lax.scan(
            body, (prob.R, t0, lm0, jnp.float32(1e-2), c0), None,
            length=iters)
        return R, t

    return run


@functools.lru_cache(maxsize=8)
def _pair_runner(max_obs: int, fx: float, fy: float, cx: float,
                 cy: float, iters: int):
    """One compiled two-pose LM solver reused for every keyframe pair
    (pairs all share one padded shape, so a cached jit pays the compile
    once)."""
    return jax.jit(_pair_core(fx, fy, cx, cy, iters))


@functools.lru_cache(maxsize=8)
def _pair_runner_batched(max_obs: int, fx: float, fy: float, cx: float,
                         cy: float, iters: int):
    """All keyframe pairs solved in ONE dispatch: the two-pose LM body
    vmapped over a [n_pairs, max_obs] batch.  Replaces the per-pair
    dispatch loop that dominated pose-graph build time (the solves are
    independent; batching them saturates the chip instead of paying
    ~n_pairs dispatch+transfer round trips)."""
    return jax.jit(jax.vmap(_pair_core(fx, fy, cx, cy, iters)))


def _per_cam_sorted(lm_idx, cam_idx, u, v, n_pose):
    """Per-camera (landmark-sorted) observation slices.  One O(M log M)
    sort instead of per-pair O(M) scans over the full observation list."""
    order = np.argsort(cam_idx, kind="stable")
    cams, lms = cam_idx[order], lm_idx[order]
    us, vs = np.asarray(u)[order], np.asarray(v)[order]
    starts = np.searchsorted(cams, np.arange(n_pose))
    ends = np.searchsorted(cams, np.arange(n_pose) + 1)
    out = []
    for i in range(n_pose):
        sl = slice(int(starts[i]), int(ends[i]))
        li = lms[sl]
        o = np.argsort(li, kind="stable")
        out.append((li[o], us[sl][o], vs[sl][o]))
    return out


def _pair_arrays(per_cam, i, j, fx, fy, cx, cy, max_obs, t_prior):
    """Padded two-pose problem arrays over tracks seen by BOTH
    keyframes i and j (vectorised: intersect + searchsorted remap; a
    landmark appears at most once per camera).  Returns
    (t0, lm0, cam_idx, lm_idx, uv, weight, n_lm) as numpy arrays."""
    li_, ui_, vi_ = per_cam[i]
    lj_, uj_, vj_ = per_cam[j]
    shared = np.intersect1d(li_, lj_, assume_unique=True)
    n_lm = len(shared)
    mi = np.isin(li_, shared, assume_unique=True)
    mj = np.isin(lj_, shared, assume_unique=True)
    li_s = np.searchsorted(shared, li_[mi]).astype(np.int32)
    lj_s = np.searchsorted(shared, lj_[mj]).astype(np.int32)
    m = len(li_s) + len(lj_s)
    if n_lm and m > max_obs:
        # defensive only (max_obs is sized over every pair solved):
        # drop whole landmarks from the top so no pair is orphaned
        keep_lm = min(n_lm, max_obs // 2)
        li_keep, lj_keep = li_s < keep_lm, lj_s < keep_lm
        mi[mi] = li_keep
        mj[mj] = lj_keep
        li_s, lj_s = li_s[li_keep], lj_s[lj_keep]
        n_lm = keep_lm
        m = len(li_s) + len(lj_s)

    lm0 = np.zeros((max_obs, 3), np.float32)
    lm0[li_s, 0] = (ui_[mi] - cx) / fx
    lm0[li_s, 1] = (vi_[mi] - cy) / fy
    lm0[li_s, 2] = 1.0
    lm0[n_lm:, 2] = 1.0
    pad = max_obs - m
    cam = np.concatenate([np.zeros(len(li_s), np.int32),
                          np.ones(len(lj_s), np.int32),
                          np.zeros(pad, np.int32)])
    lm = np.concatenate([li_s, lj_s, np.zeros(pad, np.int32)])
    uu = np.concatenate([ui_[mi], uj_[mj],
                         np.zeros(pad, np.float32)]).astype(np.float32)
    vv = np.concatenate([vi_[mi], vj_[mj],
                         np.zeros(pad, np.float32)]).astype(np.float32)
    weight = np.concatenate([np.ones(m, np.float32),
                             np.zeros(pad, np.float32)])
    t0 = np.zeros((2, 3), np.float32)
    t0[1] = t_prior[j] - t_prior[i]
    return (t0, lm0, cam, lm, np.stack([uu, vv], -1), weight, n_lm)


def build_keyframe_pose_graph(lm_idx, cam_idx, u, v, n_pose,
                              fx, fy, cx, cy, pair_iters: int = 8):
    """Construct the keyframe SE(3) pose graph (without optimizing it):
    tiny two-pose BA per chain/skip keyframe pair — assembled
    vectorised on the host, solved as ONE batched vmapped dispatch —
    -> relative-pose edges, chained-integration absolute poses as the
    initial estimate.  Returns a PoseGraph ready for
    optimize_pose_graph."""
    lm_idx = np.asarray(lm_idx)
    cam_idx = np.asarray(cam_idx)
    u, v = np.asarray(u), np.asarray(v)
    t_prior = ba_translation_prior(
        lm_idx, cam_idx, u, v,
        _first_obs(lm_idx), n_pose, fx, fy)
    per_cam = _per_cam_sorted(lm_idx, cam_idx, u, v, n_pose)

    # chain edges (i, i+1) plus redundant skip edges (i, i+2) so the
    # pose graph has over-determination to optimize, not a bare chain
    pairs = [(i, i + 1) for i in range(n_pose - 1)]
    pairs += [(i, i + 2) for i in range(n_pose - 2)]

    # fixed shape across pairs -> one compiled tiny-BA program; sized
    # by the shared-landmark observation count of EVERY pair solved
    # (skip edges included — they can share more than chain edges)
    def shared_obs(i, j):
        return 2 * len(np.intersect1d(per_cam[i][0], per_cam[j][0],
                                      assume_unique=True))

    max_obs = max([shared_obs(i, j) for i, j in pairs] + [1])
    max_obs = max(8, int(2 ** np.ceil(np.log2(max_obs))))

    # assemble every solvable pair, then solve them all in one batch
    solve_pairs, weak_chain = [], []
    for i, j in pairs:
        arrs = _pair_arrays(per_cam, i, j, fx, fy, cx, cy, max_obs,
                            t_prior)
        if arrs[-1] < 8:
            if j == i + 1:
                weak_chain.append((i, j))  # identity/prior edge
            continue  # drop weak skip edges entirely
        solve_pairs.append(((i, j), arrs[:-1]))

    edges = {}
    if solve_pairs:
        batch = [np.stack([a[k] for _, a in solve_pairs])
                 for k in range(6)]
        run = _pair_runner_batched(max_obs, fx, fy, cx, cy, pair_iters)
        Rb, tb = (np.asarray(o) for o in run(*batch))
        for k, ((i, j), _) in enumerate(solve_pairs):
            # Z_ij at the solved pair: (R_i R_j^T, t_i - R_i R_j^T t_j)
            Rrel = Rb[k, 0] @ Rb[k, 1].T
            edges[(i, j)] = (Rrel.astype(np.float32),
                             (tb[k, 0] - Rrel @ tb[k, 1]).astype(
                                 np.float32))
    for i, j in weak_chain:
        edges[(i, j)] = (np.eye(3, dtype=np.float32),
                         (t_prior[j] - t_prior[i]).astype(np.float32))

    Rz, tz, ei, ej = [], [], [], []
    for (i, j), (Rr, tr) in sorted(edges.items()):
        Rz.append(Rr)
        tz.append(tr)
        ei.append(i)
        ej.append(j)

    # chain integration (consecutive edges only) for the start point
    consec = {a: idx for idx, (a, b) in enumerate(zip(ei, ej))
              if b == a + 1}
    R0 = [np.eye(3, dtype=np.float32)]
    t0 = [np.zeros(3, np.float32)]
    for i in range(n_pose - 1):
        kk = consec[i]
        # T_j = Z_ij^-1 * T_i  (camera-from-world)
        Rj = Rz[kk].T @ R0[-1]
        tj = Rz[kk].T @ (t0[-1] - tz[kk])
        R0.append(Rj.astype(np.float32))
        t0.append(tj.astype(np.float32))

    return PoseGraph(
        R=jnp.asarray(np.stack(R0)), t=jnp.asarray(np.stack(t0)),
        ei=jnp.asarray(ei, jnp.int32), ej=jnp.asarray(ej, jnp.int32),
        Rz=jnp.asarray(np.stack(Rz)), tz=jnp.asarray(np.stack(tz)),
        weight=jnp.ones(len(ei), jnp.float32))


def keyframe_pose_graph_init(lm_idx, cam_idx, u, v, n_pose,
                             fx, fy, cx, cy, pair_iters: int = 8,
                             pg_iters: int = 10):
    """Absolute keyframe poses from tracked features only.

    1. build_keyframe_pose_graph: pairwise tiny BAs -> relative-pose
       edges + chained initial poses;
    2. SE(3) pose-graph optimization over chain + skip edges;
    3. returns (R [P,3,3], t [P,3]) for the full BA to start from.
    """
    pg = build_keyframe_pose_graph(lm_idx, cam_idx, u, v, n_pose,
                                   fx, fy, cx, cy, pair_iters)
    R, t, costs = optimize_pose_graph(pg, iterations=pg_iters)
    return np.asarray(R), np.asarray(t), np.asarray(costs)


def _first_obs(lm_idx):
    n_lm = int(lm_idx.max()) + 1 if len(lm_idx) else 0
    first = np.full(n_lm, -1, np.int64)
    ids, idx = np.unique(lm_idx, return_index=True)
    first[ids] = idx
    return first
