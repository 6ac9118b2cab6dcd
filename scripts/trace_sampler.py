#!/usr/bin/env python
"""Capture + aggregate a device trace of the sampling path.

    ARK_TPU_BENCH_MODEL=t-ARK python scripts/trace_sampler.py [--out FILE]

Reuses bench.py's setup (same config/env knobs: ARK_TPU_BENCH_MODEL,
ARK_TPU_BENCH_SAMPLE_DTYPE, ARK_TPU_BENCH_SAMPLE_WDTYPE, ...), warms the
SamplerBank, wraps ONE pipelined sampling dispatch in jax.profiler.trace,
then parses the written Chrome-trace (.trace.json.gz) and prints device-op
durations aggregated by op name, largest first — the t-ARK step budget
(round-5 VERDICT item 3: where do the non-head 36% go?).

The xplane protos need tensorflow to parse; the trace.json.gz is plain
Chrome-trace JSON, so the aggregation here has no extra dependencies.
Reference perf surface: /root/reference/kgvae/model/models.py:407-471
(the sampling loop this path re-implements TPU-natively).
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import re
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def capture(trace_dir):
    import jax
    import numpy as np
    import bench

    cfg, bundle, model = bench.build_setup()
    from ark_tpu.train import create_train_state
    from ark_tpu.train.loop import SamplerBank

    layout = bundle.layout
    state = create_train_state(model, jax.random.key(0))
    scfg = dict(cfg, sample_chunk=bench.SAMPLE_BATCH)
    sd = os.environ.get("ARK_TPU_BENCH_SAMPLE_DTYPE", "")
    if sd:
        scfg["sample_dtype"] = sd
    bank = SamplerBank(model, layout, scfg)
    total = bench.SAMPLE_TOTAL
    print(f"[trace] compiling + warmup sampler ({total} graphs) ...",
          flush=True)
    t0 = time.time()
    _ = int(bank.sample_sequences(state.params, jax.random.key(3),
                                  total).sum())
    print(f"[trace] warmup {time.time()-t0:.1f}s", flush=True)

    with jax.profiler.trace(trace_dir):
        out = bank.sample_sequences_device(state.params, jax.random.key(11),
                                           total)
        np.asarray(out)
    print(f"[trace] captured to {trace_dir}", flush=True)


def aggregate(trace_dir, top=40):
    paths = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not paths:
        raise SystemExit(f"no .trace.json.gz under {trace_dir}")
    with gzip.open(paths[0], "rt") as f:
        trace = json.load(f)
    # device-thread events: pid whose process_name mentions TPU/device;
    # fall back to "every complete event with a dur" minus obvious host pids
    proc_names = {}
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            proc_names[ev["pid"]] = ev["args"].get("name", "")
    device_pids = {p for p, n in proc_names.items()
                   if re.search(r"TPU|/device:|XLA", n, re.I)}
    agg = collections.Counter()
    total = 0.0
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") != "X" or "dur" not in ev:
            continue
        if device_pids and ev.get("pid") not in device_pids:
            continue
        name = ev.get("name", "?")
        # strip fusion instance suffixes so repeats aggregate
        name = re.sub(r"\.\d+$", "", name)
        agg[name] += ev["dur"]
        total += ev["dur"]
    rows = agg.most_common(top)
    print(json.dumps({"trace_total_us": round(total, 1),
                      "pids": {str(p): n for p, n in proc_names.items()
                               if p in device_pids}}))
    for name, us in rows:
        print(json.dumps({"op": name[:160], "us": round(us, 1),
                          "share": round(us / total, 4) if total else 0}))
    return agg, total


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace-dir", default="")
    ap.add_argument("--parse-only", action="store_true",
                    help="skip capture; aggregate an existing trace dir")
    ap.add_argument("--top", type=int, default=40)
    args = ap.parse_args()
    tdir = args.trace_dir or tempfile.mkdtemp(prefix="sampler_trace_")
    if not args.parse_only:
        capture(tdir)
    aggregate(tdir, args.top)


if __name__ == "__main__":
    main()
