"""Profiling utilities — the TPU analogue of the reference's gprof/nsys
toolchain (src/V1/Makefile:76-91, src/V4/Makefile:100-103).

Two layers:
* `trace(...)` — context manager around `jax.profiler` producing an
  xplane/perfetto trace directory;
* `op_breakdown(...)` — parses the perfetto JSON trace and aggregates
  on-device op time by (source line, HLO category), the moral
  equivalent of a gprof flat profile for the compiled XLA program.
"""

from __future__ import annotations

import collections
import contextlib
import glob
import gzip
import json
import os


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax profiler trace around the with-block."""
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def _latest_trace_json(log_dir: str) -> str:
    paths = glob.glob(os.path.join(log_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not paths:
        raise FileNotFoundError(f"no .trace.json.gz under {log_dir}")
    return max(paths, key=os.path.getmtime)


def op_breakdown(log_dir: str, runs: int = 1, top: int = 30):
    """[(us_per_run, count_per_run, category, source), ...] sorted by time.

    Aggregates complete events on device tracks, skipping container ops
    (whiles, jit wrappers) so leaf kernel time is counted once.
    """
    with gzip.open(_latest_trace_json(log_dir)) as f:
        t = json.load(f)
    ev = t["traceEvents"]
    pids = {}
    for e in ev:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pids[e["pid"]] = e["args"].get("name", "")
    agg = collections.Counter()
    cnt = collections.Counter()
    for e in ev:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        if not pids.get(e["pid"], "").startswith("/device"):
            continue
        name = e.get("name", "")
        if name.startswith(("while", "jit", "closed_call")):
            continue
        a = e.get("args", {})
        key = (a.get("hlo_category", "?"), a.get("source", name))
        agg[key] += e["dur"]
        cnt[key] += 1
    rows = [(d / runs, cnt[k] / runs, k[0], k[1])
            for k, d in agg.most_common(top)]
    return rows


def print_breakdown(log_dir: str, runs: int = 1, top: int = 30) -> None:
    for us, n, cat, src in op_breakdown(log_dir, runs, top):
        print(f"{us:9.1f} us  n={n:7.1f}  {cat[:22]:22s} {src}")
