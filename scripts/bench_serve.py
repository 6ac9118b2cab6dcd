#!/usr/bin/env python
"""Serve-daemon load test: measured throughput/latency for the serving story.

    python scripts/bench_serve.py --checkpoint <path>.pt [--out FILE]

Drives ark_tpu.experiments.serve as a subprocess through its JSONL
protocol (stdin/stdout pipes) and measures, per scenario, wall-clock
end-to-end throughput plus per-request latency percentiles (submission ->
response line, timestamped as each response arrives on the pipe):

  - burst-coalesce:   64 seedless n=100 requests, coalescing ON (bursts
                      pack into full device chunks)
  - burst-nocoalesce: the same burst with --no-coalesce (each request pays
                      its own dispatch) — the coalescing A/B
  - seeded-pipelined: 16 seeded n=512 requests, pipeline depth 4 (fetch
                      overlaps device compute; bitwise-deterministic per
                      request)
  - seeded-serial:    the same stream at pipeline depth 1 — the
                      pipelining A/B

Prints one JSON line per scenario and a final {"serve_load_test": ...}
summary line; the round-5 VERDICT item 6 artifact (recorded in
docs/BENCH_NOTES.md). Reference equivalent: the generate path
(/root/reference/kgvae/model/models.py:407-471) — the reference has no
serving machinery at all.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_scenario(name, ckpt, requests, extra_args, batch):
    """Spawn a fresh daemon, submit all requests at t0, timestamp responses.

    A fresh daemon per scenario keeps scenarios independent (each pays its
    own compile; the measured window EXCLUDES warmup — the daemon warms the
    request sizes first via --warmup so compiles happen before t0)."""
    sizes = sorted({r["n"] for r in requests})
    cmd = [sys.executable, "-m", "ark_tpu.experiments.serve",
           "--checkpoint", ckpt, "--batch", str(batch),
           "--warmup", ",".join(str(s) for s in sizes),
           "--format", "none"] + extra_args
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    err = open(os.environ.get("BENCH_SERVE_STDERR", os.devnull), "ab")
    proc = subprocess.Popen(cmd, stdin=subprocess.PIPE,
                            stdout=subprocess.PIPE, stderr=err,
                            text=True, cwd=REPO)
    try:
        # wait for warmup: ping round-trips only after warmup completes
        proc.stdin.write(json.dumps({"cmd": "ping"}) + "\n")
        proc.stdin.flush()
        line = proc.stdout.readline()
        assert json.loads(line).get("ok"), f"daemon ping failed: {line!r}"

        t0 = time.perf_counter()
        for i, r in enumerate(requests):
            proc.stdin.write(json.dumps(dict(r, id=i)) + "\n")
        proc.stdin.flush()
        lat, n_graphs = [], 0
        for _ in requests:
            line = proc.stdout.readline()
            t = time.perf_counter() - t0
            rec = json.loads(line)
            assert "error" not in rec, rec
            lat.append(t)
            n_graphs += rec["n"]
        wall = time.perf_counter() - t0
        proc.stdin.write(json.dumps({"cmd": "shutdown"}) + "\n")
        proc.stdin.flush()
        proc.wait(timeout=120)
    finally:
        if proc.poll() is None:
            proc.kill()
    lat.sort()
    pct = lambda p: round(lat[min(len(lat) - 1, int(p * len(lat)))] * 1e3, 1)
    row = {"scenario": name, "requests": len(requests), "graphs": n_graphs,
           "wall_s": round(wall, 3), "graphs_per_s": round(n_graphs / wall, 1),
           "latency_ms": {"p50": pct(0.50), "p90": pct(0.90),
                          "p99": pct(0.99), "max": round(lat[-1] * 1e3, 1)}}
    print(json.dumps(row), flush=True)
    return row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--burst", type=int, default=64)
    ap.add_argument("--burst-n", type=int, default=100)
    ap.add_argument("--seeded", type=int, default=16)
    ap.add_argument("--seeded-n", type=int, default=512)
    args = ap.parse_args()

    burst = [{"n": args.burst_n} for _ in range(args.burst)]
    seeded = [{"n": args.seeded_n, "seed": 1000 + i}
              for i in range(args.seeded)]

    rows = [
        run_scenario("burst-coalesce", args.checkpoint, burst,
                     ["--pipeline-depth", "4"], args.batch),
        run_scenario("burst-nocoalesce", args.checkpoint, burst,
                     ["--pipeline-depth", "4", "--no-coalesce"], args.batch),
        run_scenario("seeded-pipelined", args.checkpoint, seeded,
                     ["--pipeline-depth", "4"], args.batch),
        run_scenario("seeded-serial", args.checkpoint, seeded,
                     ["--pipeline-depth", "1"], args.batch),
    ]
    best = max(rows, key=lambda r: r["graphs_per_s"])
    print(json.dumps({"serve_load_test": {r["scenario"]: r["graphs_per_s"]
                                          for r in rows},
                      "best": best["scenario"],
                      "best_graphs_per_s": best["graphs_per_s"]}))


if __name__ == "__main__":
    main()
