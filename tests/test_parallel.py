"""Multi-device mesh tests on the virtual 8-device CPU mesh."""

import os

import numpy as np
import pytest

import jax

import klt_tpu as klt
from klt_tpu.parallel import make_mesh, make_batch_step, make_pair_step
from conftest import load_xyv


@pytest.fixture(scope="module")
def devices8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return jax.devices()[:8]


def test_make_mesh_shapes(devices8):
    m = make_mesh({"data": 4, "feat": 2})
    assert m.shape == {"data": 4, "feat": 2}
    m = make_mesh({"data": -1})
    assert m.shape == {"data": 8}
    with pytest.raises(ValueError):
        make_mesh({"data": 3})


def test_batched_step_matches_single(provided_frames):
    """vmapped batch step == per-sequence step."""
    cfg = klt.TrackingConfig()
    ox, oy, ov = load_xyv("select_img0.xyv")
    n = 64
    x = np.stack([ox[:n], ox[:n] + 1.0]).astype(np.float32)
    y = np.stack([oy[:n], oy[:n]]).astype(np.float32)
    v = np.stack([ov[:n], ov[:n]]).astype(np.int32)
    img1 = np.stack([provided_frames[0], provided_frames[1]])
    img2 = np.stack([provided_frames[1], provided_frames[2]])

    batch = make_batch_step(cfg)
    xb, yb, vb = batch(img1, img2, x, y, v)

    single = jax.jit(make_pair_step(cfg))
    for b in range(2):
        xs, ys, vs = single(img1[b], img2[b], x[b], y[b], v[b])
        np.testing.assert_allclose(np.asarray(xb[b]), np.asarray(xs),
                                   atol=1e-4)
        np.testing.assert_array_equal(np.asarray(vb[b]), np.asarray(vs))


def test_sharded_batch_step(devices8, provided_frames):
    """Mesh-sharded batch step executes and matches unsharded results."""
    cfg = klt.TrackingConfig()
    mesh = make_mesh({"data": 4, "feat": 2})
    ox, oy, ov = load_xyv("select_img0.xyv")
    n = 64
    b = 8
    rng = np.random.RandomState(0)
    x = np.stack([ox[:n] + rng.uniform(-1, 1, n) for _ in range(b)])
    x = x.astype(np.float32)
    y = np.tile(oy[:n], (b, 1)).astype(np.float32)
    v = np.tile(ov[:n], (b, 1)).astype(np.int32)
    img1 = np.stack([provided_frames[i % 9] for i in range(b)])
    img2 = np.stack([provided_frames[i % 9 + 1] for i in range(b)])

    sharded = make_batch_step(cfg, mesh, feat_axis="feat")
    xs, ys, vs = sharded(img1, img2, x, y, v)
    plain = make_batch_step(cfg)
    xp, yp, vp = plain(img1, img2, x, y, v)

    np.testing.assert_array_equal(np.asarray(vs), np.asarray(vp))
    np.testing.assert_allclose(np.asarray(xs), np.asarray(xp), atol=1e-3)


def test_graft_entry_dryrun(devices8):
    import importlib.util
    import os
    spec = importlib.util.spec_from_file_location(
        "graft_entry",
        os.path.join(os.path.dirname(__file__), "..", "__graft_entry__.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    fn, args = mod.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    assert out[0].shape == args[2].shape

    mod.dryrun_multichip(8)


def test_batched_sequence_matches_single(provided_frames):
    """track_sequences_batched must reproduce the single-sequence
    pipeline exactly (jnp path on CPU)."""
    import jax.numpy as jnp
    from klt_tpu.config import TrackingConfig
    from klt_tpu.runtime.pipeline import track_sequence
    from klt_tpu.parallel.batched_lk import track_sequences_batched
    import klt_tpu as klt

    cfg = TrackingConfig(sequential_mode=True)
    frames = np.stack(provided_frames[:4])
    tracker = klt.KLTracker(cfg)
    fl = klt.FeatureList.create(64)
    tracker.select_good_features(frames[0], fl)

    b = 3
    fb = jnp.asarray(np.broadcast_to(frames, (b,) + frames.shape).copy())
    xb = jnp.asarray(np.broadcast_to(fl.x, (b, 64)).copy())
    yb = jnp.asarray(np.broadcast_to(fl.y, (b, 64)).copy())
    vb = jnp.asarray(np.broadcast_to(fl.val, (b, 64)).copy())
    out = track_sequences_batched(fb, xb, yb, vb, cfg)
    ref = track_sequence(jnp.asarray(frames), jnp.asarray(fl.x),
                         jnp.asarray(fl.y), jnp.asarray(fl.val), cfg)
    for a, r in zip(out, ref):
        for i in range(b):
            np.testing.assert_array_equal(np.asarray(a[:, i]),
                                          np.asarray(r))


@pytest.mark.slow
def test_batched_matches_single_odd_sizes(provided_frames, monkeypatch):
    """Batched kernel path at awkward (B, F) combos must match the
    single-sequence path lane for lane."""
    import jax.numpy as jnp
    from klt_tpu.config import TrackingConfig
    from klt_tpu.parallel.batched_lk import track_sequences_batched
    from klt_tpu.runtime.pipeline import track_sequence

    monkeypatch.setenv("KLT_TPU_PALLAS_INTERPRET", "1")
    cfg = TrackingConfig(sequential_mode=True)
    frames = np.stack(provided_frames[:4])
    rng = np.random.RandomState(9)
    # (2, 300): 600 lanes crosses the stall-compaction threshold (512)
    # so the batched compact tail is exercised too
    for b, n in ((3, 37), (2, 130), (2, 300)):
        x = rng.uniform(30, 290, (b, n)).astype(np.float32)
        y = rng.uniform(30, 210, (b, n)).astype(np.float32)
        v = np.zeros((b, n), np.int32)
        fb = jnp.asarray(np.broadcast_to(frames, (b,) + frames.shape))
        xs, ys, vs = track_sequences_batched(
            fb, jnp.asarray(x), jnp.asarray(y), jnp.asarray(v), cfg)
        for lane in range(b):
            rs = track_sequence(jnp.asarray(frames),
                                jnp.asarray(x[lane]),
                                jnp.asarray(y[lane]),
                                jnp.asarray(v[lane]), cfg)
            np.testing.assert_array_equal(np.asarray(vs[-1][lane]),
                                          np.asarray(rs[2][-1]))
            np.testing.assert_allclose(np.asarray(xs[-1][lane]),
                                       np.asarray(rs[0][-1]), atol=1e-4)


def test_sequence_canvas_carry_matches_no_carry(provided_frames,
                                                monkeypatch):
    """The sequential canvas carry (default-on inside track_sequence's
    scan) must be bit-identical to carry-FREE per-pair tracking on the
    kernel path: the carried p1 window is the same image content the
    extraction would fetch.  This is the only test that pits the carry
    against a no-carry oracle (everything else compares two
    carry-enabled runs), so it guards the validity-bound math in
    _track_level_kernel and lk2's IO1Y/IO1X window shift."""
    import jax.numpy as jnp
    from klt_tpu.config import TrackingConfig
    from klt_tpu.runtime.pipeline import track_sequence
    from klt_tpu.ops.pyramid import build_pyramid_stacks
    from klt_tpu.ops.lk import track_features_pyramid_stacks
    import klt_tpu as klt

    monkeypatch.setenv("KLT_TPU_PALLAS_INTERPRET", "1")
    cfg = TrackingConfig(sequential_mode=True)
    frames = np.stack(provided_frames[:4])
    tracker = klt.KLTracker(cfg)
    fl = klt.FeatureList.create(64)
    tracker.select_good_features(frames[0], fl)
    x = jnp.asarray(fl.x)
    y = jnp.asarray(fl.y)
    v = jnp.asarray(fl.val)

    xs, ys, vs = track_sequence(jnp.asarray(frames), x, y, v, cfg)

    sts = [tuple(build_pyramid_stacks(jnp.asarray(f), cfg))
           for f in frames]
    cur = (x, y, v)
    for t in range(frames.shape[0] - 1):
        xn, yn, vn = track_features_pyramid_stacks(
            list(sts[t]), list(sts[t + 1]), *cur, cfg)
        np.testing.assert_array_equal(np.asarray(vs[t]), np.asarray(vn))
        np.testing.assert_array_equal(np.asarray(xs[t]), np.asarray(xn))
        np.testing.assert_array_equal(np.asarray(ys[t]), np.asarray(yn))
        cur = (xn, yn, vn)


def test_carry_partial_refresh_bit_exact(provided_frames, monkeypatch):
    """KLT_TPU_CARRY_REFRESH (refresh only the stale lanes of the
    carried p1 canvas) must be bit-identical to the all-or-nothing
    fallback.  Exercised on the replacement scan, where freshly
    replaced features mark their carry stale EVERY step — the exact
    case the partial refresh exists for — with n > 128 so the
    compacted arm engages."""
    import jax.numpy as jnp
    from klt_tpu.config import TrackingConfig
    from klt_tpu.runtime.pipeline import track_sequence_replace
    import klt_tpu as klt

    monkeypatch.setenv("KLT_TPU_PALLAS_INTERPRET", "1")
    cfg = TrackingConfig(sequential_mode=True)
    frames = np.stack(provided_frames[:4])
    tracker = klt.KLTracker(cfg)
    fl = klt.FeatureList.create(160)
    tracker.select_good_features(frames[0], fl)
    args = (jnp.asarray(frames), jnp.asarray(fl.x), jnp.asarray(fl.y),
            jnp.asarray(fl.val), cfg)

    monkeypatch.setenv("KLT_TPU_CARRY_REFRESH", "0")
    base = [np.asarray(a) for a in track_sequence_replace(*args)]
    monkeypatch.setenv("KLT_TPU_CARRY_REFRESH", "1")
    out = [np.asarray(a) for a in track_sequence_replace(*args)]
    for a, r in zip(out, base):
        np.testing.assert_array_equal(a, r)


def test_precomp_pyramid_bit_exact(provided_frames, monkeypatch):
    """KLT_TPU_PRECOMP_PYR=1 (whole-chunk pyramid stacks built ahead of
    the scan, fed via scan xs) must be bit-identical to the per-step
    build — it is the same stacks in the same per-step program."""
    import jax.numpy as jnp
    from klt_tpu.config import TrackingConfig
    from klt_tpu.parallel.batched_lk import track_sequences_batched

    monkeypatch.setenv("KLT_TPU_PALLAS_INTERPRET", "1")
    cfg = TrackingConfig(sequential_mode=True)
    frames = np.stack(provided_frames[:4])
    # force the vmapped single-image builder for BOTH paths: interpret
    # mode inlines the Pallas kernel into the surrounding XLA:CPU
    # program, whose conv-chain rounding is context/shape-dependent at
    # the last bit, so the chunked batched builder cannot be
    # bit-stable across per-step vs precomp contexts HERE.  On the
    # real chip the batched builder is bit-equal to the single-image
    # kernel (measured, tools/check_batched_pyr.py).
    from klt_tpu.pallas import pyramid as pp
    monkeypatch.setattr(pp, "supported_batched", lambda *_: False)
    rng = np.random.RandomState(3)
    b, n = 2, 96
    x = rng.uniform(30, 290, (b, n)).astype(np.float32)
    y = rng.uniform(30, 210, (b, n)).astype(np.float32)
    v = np.zeros((b, n), np.int32)
    fb = jnp.asarray(np.broadcast_to(frames, (b,) + frames.shape))
    args = (fb, jnp.asarray(x), jnp.asarray(y), jnp.asarray(v), cfg)

    monkeypatch.delenv("KLT_TPU_PRECOMP_PYR", raising=False)
    base = [np.asarray(a) for a in track_sequences_batched(*args)]
    monkeypatch.setenv("KLT_TPU_PRECOMP_PYR", "1")
    pre = [np.asarray(a) for a in track_sequences_batched(*args)]
    for a, r in zip(pre, base):
        np.testing.assert_array_equal(a, r)

    # single-sequence drivers share the knob
    from klt_tpu.runtime.pipeline import (track_sequence,
                                          track_sequence_replace)
    sargs = (fb[0], jnp.asarray(x[0]), jnp.asarray(y[0]),
             jnp.asarray(v[0]), cfg)
    for fn in (track_sequence, track_sequence_replace):
        monkeypatch.setenv("KLT_TPU_PRECOMP_PYR", "1")
        pre = [np.asarray(a) for a in fn(*sargs)]
        monkeypatch.delenv("KLT_TPU_PRECOMP_PYR")
        base = [np.asarray(a) for a in fn(*sargs)]
        for a, r in zip(pre, base):
            np.testing.assert_array_equal(a, r)


def test_multihost_two_process():
    """REAL multi-host exercise (VERDICT r3 item 5): two OS processes
    under jax.distributed, a global ('data','feat') mesh spanning both
    processes' devices, host-sliced global batch via
    process_local_batch, make_batch_step over the global mesh, and an
    observation-sharded BA psum — each asserted equal to the
    single-process result inside tools/multihost_worker.py."""
    import socket
    import subprocess
    import sys

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    here = os.path.dirname(os.path.abspath(__file__))
    worker = os.path.join(here, "..", "tools", "multihost_worker.py")
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("JAX_NUM_PROCESSES", None)
    procs = [subprocess.Popen(
        [sys.executable, worker, str(port), str(pid), "2"],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
        text=True) for pid in range(2)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=600)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-3000:]}"
        assert "MULTIHOST OK" in out, out[-3000:]


def test_batched_affine_matches_single(provided_frames):
    """track_sequences_affine_batched over B distinct sequences must
    reproduce each sequence's single-stream track_sequence_affine
    result: identical statuses, positions within 1e-3 px (XLA tiles
    the [B*N]-lane einsums differently from the [N]-lane program, so
    single-ulp position differences are expected, bit-equality is
    not)."""
    import jax.numpy as jnp
    from klt_tpu.config import TrackingConfig
    from klt_tpu.runtime.pipeline import track_sequence_affine
    from klt_tpu.parallel.batched_affine import (
        track_sequences_affine_batched)

    cfg = TrackingConfig(sequential_mode=True,
                         affine_consistency_check=2)
    starts = (0, 3, 6)
    n = 48
    seqs, xs0, ys0, vs0 = [], [], [], []
    for s in starts:
        fr = np.stack(provided_frames[s:s + 4])
        tr = klt.KLTracker(cfg)
        fl = klt.FeatureList.create(n)
        tr.select_good_features(fr[0], fl)
        seqs.append(fr)
        xs0.append(fl.x.copy())
        ys0.append(fl.y.copy())
        vs0.append(fl.val.copy())

    fb = jnp.asarray(np.stack(seqs))
    xb = jnp.asarray(np.stack(xs0))
    yb = jnp.asarray(np.stack(ys0))
    vb = jnp.asarray(np.stack(vs0))
    bx, by, bv = track_sequences_affine_batched(fb, xb, yb, vb, cfg)

    for i, s in enumerate(starts):
        rx, ry, rv = track_sequence_affine(
            jnp.asarray(seqs[i]), jnp.asarray(xs0[i]),
            jnp.asarray(ys0[i]), jnp.asarray(vs0[i]), cfg)
        np.testing.assert_array_equal(np.asarray(bv[:, i]),
                                      np.asarray(rv))
        live = np.asarray(rv) >= 0
        np.testing.assert_allclose(np.asarray(bx[:, i])[live],
                                   np.asarray(rx)[live], atol=1e-3)
        np.testing.assert_allclose(np.asarray(by[:, i])[live],
                                   np.asarray(ry)[live], atol=1e-3)
