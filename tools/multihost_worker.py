"""Multi-host worker: one process of an N-process jax.distributed run.

Exercises the REAL multi-host path (VERDICT r3 item 5) on CPU:
`initialize_multihost` -> `global_data_mesh` over the processes'
combined devices -> `process_local_batch` host slicing ->
`make_batch_step` over the global mesh -> allgather -> compare against
the locally-computed unsharded result, plus an observation-sharded
bundle-adjustment psum over the same mesh.

Launched by tests/test_parallel.py::test_multihost_two_process (and
runnable by hand):

  python tools/multihost_worker.py <port> <pid> <nproc>

Prints "MULTIHOST OK" and exits 0 on success.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("XLA_FLAGS",
                      "--xla_force_host_platform_device_count=4")

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np


def main():
    port, pid, nproc = (int(a) for a in sys.argv[1:4])

    import jax
    from klt_tpu.parallel.distributed import (initialize_multihost,
                                              global_data_mesh,
                                              process_local_batch)
    initialize_multihost(f"localhost:{port}", nproc, pid)
    assert jax.process_count() == nproc, jax.process_count()
    n_local = len(jax.local_devices())
    n_global = len(jax.devices())
    assert n_global == nproc * n_local, (n_global, n_local)

    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from jax.experimental import multihost_utils
    import klt_tpu as klt
    from klt_tpu.parallel.batch import make_batch_step

    klt.set_verbosity(0)
    cfg = klt.TrackingConfig()

    # deterministic synthetic batch: shared texture, per-lane shift
    b_global, h, w, n_feat = 8, 80, 96, 16
    rng = np.random.RandomState(0)
    base = rng.randint(0, 255, (h, w)).astype(np.uint8)
    img1 = np.stack([np.roll(base, b % 3, axis=1)
                     for b in range(b_global)])
    img2 = np.stack([np.roll(base, b % 3 + 1 + (b % 2), axis=1)
                     for b in range(b_global)])
    gx, gy = np.meshgrid(np.linspace(25, w - 25, 4),
                         np.linspace(25, h - 25, 4))
    x0 = np.broadcast_to(gx.ravel().astype(np.float32),
                         (b_global, n_feat)).copy()
    y0 = np.broadcast_to(gy.ravel().astype(np.float32),
                         (b_global, n_feat)).copy()
    v0 = np.zeros((b_global, n_feat), np.int32)

    # ---- sharded step over the global mesh, host-sliced inputs ----
    mesh = global_data_mesh()
    local, off = process_local_batch(b_global)
    img_s = NamedSharding(mesh, P("data", None, None))
    feat_s = NamedSharding(mesh, P("data", None))

    def gmake(a, sh):
        return jax.make_array_from_process_local_data(
            sh, a[off:off + local])

    step = make_batch_step(cfg, mesh)
    out = step(gmake(img1, img_s), gmake(img2, img_s),
               gmake(x0, feat_s), gmake(y0, feat_s),
               gmake(v0, feat_s))
    xs, ys, vs = (np.asarray(multihost_utils.process_allgather(
        o, tiled=True)) for o in out)

    # ---- reference: unsharded local compute of the full batch ----
    step1 = make_batch_step(cfg, None)
    rx, ry, rv = (np.asarray(o) for o in step1(
        jnp.asarray(img1), jnp.asarray(img2), jnp.asarray(x0),
        jnp.asarray(y0), jnp.asarray(v0)))
    np.testing.assert_array_equal(vs, rv)
    np.testing.assert_allclose(xs, rx, atol=1e-5)
    np.testing.assert_allclose(ys, ry, atol=1e-5)

    # ---- BA psum over the same global mesh (obs-sharded) ----
    from klt_tpu.slam.ba import BAProblem, bundle_adjust
    n_pose, n_lm, m = 4, 24, 96
    rng = np.random.RandomState(1)
    lm = np.concatenate([rng.uniform(-1, 1, (n_lm, 2)),
                         rng.uniform(3, 6, (n_lm, 1))],
                        1).astype(np.float32)
    cam = np.tile(np.arange(n_pose, dtype=np.int32), m // n_pose)
    lmi = rng.randint(0, n_lm, m).astype(np.int32)
    t_true = np.cumsum(rng.uniform(-0.1, 0.1, (n_pose, 3)),
                       0).astype(np.float32)
    t_true[0] = 0
    fx = fy = 100.0
    cx = cy = 50.0
    p = lm[lmi] + t_true[cam]
    uv = np.stack([fx * p[:, 0] / p[:, 2] + cx,
                   fy * p[:, 1] / p[:, 2] + cy], -1).astype(np.float32)
    prob = BAProblem(
        R=jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32),
                           (n_pose, 3, 3)),
        t=jnp.zeros((n_pose, 3), jnp.float32),
        landmarks=jnp.asarray(lm + 0.05), cam_idx=jnp.asarray(cam),
        lm_idx=jnp.asarray(lmi), uv=jnp.asarray(uv),
        weight=jnp.ones(m, jnp.float32), fx=fx, fy=fy, cx=cx, cy=cy)
    _, _, _, costs_sh = bundle_adjust(prob, mesh=mesh, iterations=5)
    _, _, _, costs_1p = bundle_adjust(prob, mesh=None, iterations=5)
    costs_sh = np.asarray(costs_sh)
    np.testing.assert_allclose(costs_sh, np.asarray(costs_1p),
                               rtol=1e-4)
    assert costs_sh[-1] < costs_sh[0] * 0.1, costs_sh

    print(f"MULTIHOST OK pid={pid}/{nproc} devices={n_global} "
          f"local={n_local} final_cost={costs_sh[-1]:.3e}", flush=True)


if __name__ == "__main__":
    main()
