"""A/B the Pallas embedding-gather kernels vs XLA's gather on real TPU.

    python scripts/bench_embed_gather.py [--iters 300] [--warmup 2]

Times the two flagship gather sites (wd-articles geometry):

  - tok_emb: the decoder token-embedding lookup, [Vp, 512] table x
    [16, L-1] ids (train/steps.py hot path; ~1360 rows/step)
  - triples: the SAIL encoder (h|r|t) embed+concat, [Ne, 512]+[Nr, 512]
    tables x [16, 28, 3] ids (the BASELINE.json "embedding-gather" target)

for modes: xla (the default ``table[ids]``), pallas-block, pallas-dma
(ops/pallas/embed_gather.py). Each measurement jits a whole lax.scan of
``--iters`` gathers with iteration-dependent ids (so nothing hoists) and
fetches the result to host — the CLAUDE.md timing recipe for the axon
tunnel (~30 ms dispatch latency; block_until_ready unreliable).

Prints one JSON line per (site, mode) with us_per_call and effective GB/s,
plus a final verdict line recommending the ``use_pallas_embed`` default.
Decision recorded in docs/BENCH_NOTES.md; models/api.py 'auto' resolution
follows it.
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

# run as `python scripts/bench_embed_gather.py`: sys.path[0] is scripts/,
# so the repo root (where __graft_entry__ lives) must be added explicitly.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import __graft_entry__ as ge
from ark_tpu.ops import embed


def _time_scan(fn, iters, warmup):
    """fn: i -> scalar f32. Returns seconds per call, timed by host fetch."""

    @jax.jit
    def run():
        def body(c, i):
            return c + fn(i), None
        out, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(iters))
        return out

    for _ in range(warmup):
        float(run())  # compile + warm
    t0 = time.perf_counter()
    float(run())
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=300)
    ap.add_argument("--warmup", type=int, default=2)
    ap.add_argument("--interpret", action="store_true",
                    help="CPU smoke test (timings meaningless)")
    ap.add_argument("--small", action="store_true",
                    help="tiny tables (smoke test)")
    args = ap.parse_args()

    if args.interpret:
        # priority platform must be cpu BEFORE first backend use, or
        # jax.devices() dials the axon tunnel (CLAUDE.md gotchas)
        jax.config.update("jax_platforms", "cpu")
        from jax.experimental.pallas import tpu as pltpu
        ctx = pltpu.force_tpu_interpret_mode()
        ctx.__enter__()
    # one TPU job at a time (no-op once the cpu platform is pinned above)
    from ark_tpu.utils.device_lock import acquire_device_lock
    acquire_device_lock(tag="bench_embed_gather")

    print(json.dumps({"backend": jax.default_backend(),
                      "device": str(jax.devices()[0])}))

    if args.small:
        config, layout = ge._flagship_config(n_entities=512, max_edges=4,
                                             d_model=128, n_layers=2)
    else:
        config, layout = ge._flagship_config()
    d = config["d_model"]
    mult = config["vocab_pad_multiple"]
    vp = ((config["vocab_size"] + mult - 1) // mult) * mult
    b = config["batch_size"]
    lm1 = layout.seq_len - 1
    me = (layout.seq_len - 2) // 3  # max_edges (seq = 3*E + BOS/EOS)

    key = jax.random.key(0)
    tok_emb = jax.random.normal(key, (vp, d), jnp.float32)
    seq = jax.random.randint(jax.random.key(1), (b, lm1), 0,
                             config["vocab_size"])
    e_emb = jax.random.normal(jax.random.key(2),
                              (layout.num_entities, d), jnp.float32)
    r_emb = jax.random.normal(jax.random.key(3),
                              (layout.num_relations, d), jnp.float32)
    trip = jnp.stack(
        [jax.random.randint(jax.random.key(4), (b, me), 0,
                            layout.num_entities),
         jax.random.randint(jax.random.key(5), (b, me), 0,
                            layout.num_relations),
         jax.random.randint(jax.random.key(6), (b, me), 0,
                            layout.num_entities)], axis=-1)

    # the "block" schedule's (1, D) blocks violate Mosaic's (8, 128)
    # block-shape rule for arbitrary-row gathers — it lowers in interpret
    # mode only (measured: the round-5 hardware A/B errored at lowering;
    # ops/pallas/embed_gather.py docstring). Hardware A/Bs compare xla
    # vs the dma schedule; a mode that fails to lower is recorded, not fatal.
    modes = {"xla": False, "pallas-dma": "dma"}
    if args.interpret:
        modes["pallas-block"] = "block"
    results = {}

    def measure(site, name, fn, nbytes, rows):
        try:
            sec = _time_scan(fn, args.iters, args.warmup)
        except Exception as e:
            print(json.dumps({"site": site, "mode": name,
                              "error": f"{type(e).__name__}: {e}"[:300]}))
            return
        results[(site, name)] = sec
        print(json.dumps({"site": site, "mode": name, "rows": rows,
                          "us_per_call": round(sec * 1e6, 2),
                          "gb_s": round(nbytes / sec / 1e9, 1)}))

    for name, up in modes.items():
        def tok_fn(i, up=up):
            ids = (seq + i) % vp  # iteration-dependent: defeats hoisting
            return embed.take_rows(tok_emb, ids, use_pallas=up).sum()

        measure("tok_emb", name, tok_fn, 2 * b * lm1 * d * 4, b * lm1)

    for name, up in modes.items():
        def tri_fn(i, up=up):
            t = trip.at[..., 0].set((trip[..., 0] + i) % layout.num_entities)
            return embed.take_triples(e_emb, r_emb, t, use_pallas=up).sum()

        measure("triples", name, tri_fn, 2 * b * me * 3 * d * 4, b * me * 3)

    best = {}
    for site in ("tok_emb", "triples"):
        done = [m for m in modes if (site, m) in results]
        if "xla" not in done:
            continue
        site_best = min(done, key=lambda m: results[(site, m)])
        xla = results[(site, "xla")]
        best[site] = {"best": site_best,
                      "speedup_vs_xla": round(
                          xla / results[(site, site_best)], 3)}
    print(json.dumps({"verdict": best}))


if __name__ == "__main__":
    main()
