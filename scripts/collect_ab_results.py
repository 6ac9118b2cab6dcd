#!/usr/bin/env python
"""Collect the queued hardware A/B bench artifacts into one markdown table.

The round-4 tunnel outage forced every hardware measurement behind probe
loops (scripts/tpu_queue/); each run leaves one JSON line in /tmp. This
tool assembles whatever has landed into the comparison table BENCH_NOTES
wants, computing deltas against the gumbel/default control so the
flip-the-default decisions (docs/ROADMAP.md round-5 actions) are one
glance. Pure host-side file reading — never touches jax or the TPU.

Usage: python scripts/collect_ab_results.py [--dir /tmp] [--json]
"""

from __future__ import annotations

import argparse
import json
import os

# (label, filename, what changed vs the control)
RUNS = [
    ("headline ARK", "bench_ark.json", "full bench: train + sampling"),
    ("t-ARK", "bench_tark.json", "transformer family, same geometry"),
    ("chunk 1024", "bench_ark_1024.json", "SAMPLE_BATCH=1024"),
    ("gumbel control", "bench_gumbel_ctl.json",
     "SKIP_TRAIN untrained-params control for the A/Bs below"),
    ("expmin", "bench_expmin.json", "SAMPLE_STRATEGY=expmin"),
    ("bf16 head", "bench_wbf16.json", "SAMPLE_WDTYPE=bfloat16"),
    ("expmin+bf16", "bench_expmin_wbf16.json", "both"),
    ("vb2048 rc256", "bench_vb2048_rc256.json", "VBLOCK=2048 ROWCHUNK=256"),
    ("vb2048 rc256 bf16", "bench_vb2048_rc256_bf16.json", "+ bf16 head"),
    ("vb2048 rc128", "bench_vb2048_rc128.json", "VBLOCK=2048 ROWCHUNK=128"),
    ("vb1024 rc256", "bench_vb1024_rc256.json", "VBLOCK=1024 ROWCHUNK=256"),
    ("k=3", "bench_k3.json", "KCANDS=3"),
    ("k=2", "bench_k2.json", "KCANDS=2"),
    ("k=3 vb2048", "bench_k3_vb2048.json", "KCANDS=3 VBLOCK=2048 rc256"),
]
CONTROL = "bench_gumbel_ctl.json"


def _load(path):
    try:
        with open(path) as f:
            txt = f.read().strip()
    except OSError:
        return None
    if not txt:
        return None
    # bench prints exactly one JSON line on stdout (logs go to stderr)
    for line in reversed(txt.splitlines()):
        line = line.strip()
        if line.startswith("{"):
            try:
                return json.loads(line)
            except json.JSONDecodeError:
                return None
    return None


def collect(d):
    rows = []
    control = _load(os.path.join(d, CONTROL))
    cgps = (control or {}).get("sample_graphs_per_sec_chip")
    for label, fname, what in RUNS:
        r = _load(os.path.join(d, fname))
        if r is None:
            rows.append({"label": label, "file": fname, "what": what,
                         "status": "pending"})
            continue
        row = {"label": label, "file": fname, "what": what,
               "status": r.get("status", "ok"),
               "train_gps": r.get("value"),  # 0.0 under SKIP_TRAIN
               "sample_gps": r.get("sample_graphs_per_sec_chip"),
               "sample_serial_gps": r.get(
                   "sample_single_request_graphs_per_sec"),
               "train_mfu": r.get("train_mfu"),
               "sample_mfu": r.get("sample_mfu")}
        if cgps and row["sample_gps"] and fname != CONTROL:
            row["vs_control"] = round(row["sample_gps"] / cgps, 3)
        rows.append(row)
    return rows


def to_markdown(rows):
    out = ["| run | sample g/s | vs control | sample MFU | train g/s | "
           "status |",
           "|---|---|---|---|---|---|"]
    for r in rows:
        def fmt(x, nd=0):
            return ("" if x is None else
                    f"{x:.{nd}f}" if isinstance(x, (int, float)) else str(x))
        out.append(
            f"| {r['label']} ({r['what']}) | {fmt(r.get('sample_gps'))} | "
            f"{fmt(r.get('vs_control'), 3)} | {fmt(r.get('sample_mfu'), 3)} "
            f"| {fmt(r.get('train_gps'))} | {r['status']} |")
    return "\n".join(out)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--dir", default="/tmp")
    p.add_argument("--json", action="store_true")
    args = p.parse_args(argv)
    rows = collect(args.dir)
    if args.json:
        print(json.dumps(rows, indent=1))
    else:
        print(to_markdown(rows))
        done = sum(r["status"] != "pending" for r in rows)
        print(f"\n{done}/{len(rows)} runs landed (pending ones are still "
              "queued or the tunnel is down; queue commands + env settings: "
              "scripts/tpu_queue/tpu_queue_master.sh)")
    return rows


if __name__ == "__main__":
    main()
