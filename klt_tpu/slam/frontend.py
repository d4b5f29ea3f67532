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


@functools.lru_cache(maxsize=8)
def _pair_runner(max_obs: int, fx: float, fy: float, cx: float,
                 cy: float, iters: int):
    """One compiled two-pose Levenberg-Marquardt solver reused for
    every keyframe pair (bundle_adjust re-jits per call because its
    driver closes over the problem arrays; pairs here all share one
    padded shape, so a cached jit pays the compile once).  The LM
    accept/reject is load-bearing: plain damped Gauss-Newton diverges
    (NaN) on real pairs with near-degenerate shared geometry."""

    @jax.jit
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


def _pair_problem(lm_idx, cam_idx, u, v, i, j, fx, fy, cx, cy,
                  max_obs, t_prior):
    """Two-pose BAProblem over tracks seen by BOTH keyframes i and j,
    padded to max_obs observations / max_obs landmarks."""
    on_i = set(lm_idx[cam_idx == i].tolist())
    on_j = set(lm_idx[cam_idx == j].tolist())
    shared = np.asarray(sorted(on_i & on_j), np.int64)
    sel = np.isin(lm_idx, shared) & np.isin(cam_idx, [i, j])
    li, ci, uu, vv = lm_idx[sel], cam_idx[sel], u[sel], v[sel]
    remap = {int(t): k for k, t in enumerate(shared)}
    li = np.asarray([remap[int(t)] for t in li], np.int32)
    ci = (ci == j).astype(np.int32)
    n_lm = len(shared)

    m = len(li)
    if m > max_obs:
        # max_obs is sized over every pair actually solved, so this is
        # a defensive path only; drop WHOLE landmarks (highest ids
        # first) so no observation pair is orphaned
        counts = np.bincount(li, minlength=n_lm)
        keep_lm = n_lm
        while keep_lm > 0 and counts[:keep_lm].sum() > max_obs:
            keep_lm -= 1
        keep = li < keep_lm
        li, ci, uu, vv = li[keep], ci[keep], uu[keep], vv[keep]
        n_lm, m = keep_lm, int(keep.sum())
    pad = max_obs - m

    lm0 = np.zeros((max_obs, 3), np.float32)
    first = {}
    for k in range(len(li)):
        if ci[k] == 0 and int(li[k]) not in first:
            first[int(li[k])] = k
    for lid, k in first.items():
        lm0[lid] = [(uu[k] - cx) / fx, (vv[k] - cy) / fy, 1.0]
    lm0[n_lm:, 2] = 1.0

    z = lambda a, val: np.concatenate(
        [a, np.full(pad, val, a.dtype)])
    weight = np.concatenate([np.ones(m, np.float32),
                             np.zeros(pad, np.float32)])
    t0 = np.zeros((2, 3), np.float32)
    t0[1] = t_prior[j] - t_prior[i]
    return BAProblem(
        R=jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32),
                           (2, 3, 3)).copy(),
        t=jnp.asarray(t0),
        landmarks=jnp.asarray(lm0),
        cam_idx=jnp.asarray(z(li * 0 + ci, 0)),
        lm_idx=jnp.asarray(z(li, 0)),
        uv=jnp.asarray(np.stack(
            [z(uu.astype(np.float32), 0.0),
             z(vv.astype(np.float32), 0.0)], -1)),
        weight=jnp.asarray(weight), fx=fx, fy=fy, cx=cx, cy=cy), n_lm


def build_keyframe_pose_graph(lm_idx, cam_idx, u, v, n_pose,
                              fx, fy, cx, cy, pair_iters: int = 8):
    """Construct the keyframe SE(3) pose graph (without optimizing it):
    tiny two-pose BA per chain/skip keyframe pair (one compiled
    program, shapes padded to the largest pair) -> relative-pose edges,
    chained-integration absolute poses as the initial estimate.
    Returns a PoseGraph ready for optimize_pose_graph."""
    t_prior = ba_translation_prior(
        lm_idx, cam_idx, u, v,
        _first_obs(lm_idx), n_pose, fx, fy)

    # chain edges (i, i+1) plus redundant skip edges (i, i+2) so the
    # pose graph has over-determination to optimize, not a bare chain
    pairs = [(i, i + 1) for i in range(n_pose - 1)]
    pairs += [(i, i + 2) for i in range(n_pose - 2)]

    # fixed shape across pairs -> one compiled tiny-BA program; sized
    # by the shared-landmark observation count of EVERY pair solved
    # (skip edges included — they can share more than chain edges)
    def shared_obs(i, j):
        on_i = set(lm_idx[cam_idx == i].tolist())
        on_j = set(lm_idx[cam_idx == j].tolist())
        shared = np.asarray(sorted(on_i & on_j), np.int64)
        return int((np.isin(lm_idx, shared) &
                    np.isin(cam_idx, [i, j])).sum())

    max_obs = max([shared_obs(i, j) for i, j in pairs] + [1])
    max_obs = max(8, int(2 ** np.ceil(np.log2(max_obs))))

    Rz, tz, ei, ej = [], [], [], []
    for i, j in pairs:
        prob, n_lm = _pair_problem(lm_idx, cam_idx, u, v, i, j,
                                   fx, fy, cx, cy, max_obs, t_prior)
        if n_lm < 8:
            if j != i + 1:
                continue  # drop weak skip edges entirely
            Rz.append(np.eye(3, dtype=np.float32))
            tz.append((t_prior[j] - t_prior[i]).astype(np.float32))
        else:
            run = _pair_runner(max_obs, fx, fy, cx, cy, pair_iters)
            R, t = run(prob.t, prob.landmarks, prob.cam_idx,
                       prob.lm_idx, prob.uv, prob.weight)
            R, t = np.asarray(R), np.asarray(t)
            # Z_ij at the solved pair: (R_i R_j^T, t_i - R_i R_j^T t_j)
            Rrel = R[0] @ R[1].T
            Rz.append(Rrel.astype(np.float32))
            tz.append((t[0] - Rrel @ t[1]).astype(np.float32))
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
    for m in range(len(lm_idx) - 1, -1, -1):
        first[lm_idx[m]] = m
    return first
