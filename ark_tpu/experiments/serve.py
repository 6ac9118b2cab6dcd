"""Long-running graph-serving daemon — JSONL requests in, JSONL graphs out.

New tooling beyond the reference surface (the reference can only sample
inside its training scripts, train.py:513-532): a persistent process that
keeps the compiled samplers warm and answers generation requests without
re-paying checkpoint load or compilation, implementing the serving story
documented in docs/MIGRATION.md "Serving":

    python -m ark_tpu.experiments.serve --checkpoint <path>.pt \
        [--batch B] [--temperature T] [--top-p P] [--top-k K] [--greedy]
        [--mesh auto|off] [--shard-vocab] [--pipeline-depth D]
        [--format labels|ints|none] [--verify] [--warmup N[,N...]]
        [--input FILE] [--output FILE]

Protocol: one JSON object per input line; one JSON response line per
request, in request order.

  {"id": 7, "n": 500, "seed": 42}
      -> {"id": 7, "n": 500, "ms": 41.3, "graphs": [[[h, r, t], ...], ...]}
  {"cmd": "ping"} / {"cmd": "stats"} / {"cmd": "shutdown"}
      -> {"ok": true, ...}
  {"cmd": "trace", "n": K, "dir": DIR}
      -> {"ok": true, "trace_dir": DIR, "n": K} and a jax.profiler trace
         (xprof/perfetto-viewable device + host timelines) is captured
         around the next K data requests — live-daemon debuggability
         without a restart.

Determinism: a request with an explicit ``seed`` returns exactly the
graphs ``generate --seed <seed> --num-samples <n>`` would (same
SamplerBank rng stream); requests without a seed draw from the daemon's
own stream (``--seed`` at startup). Request sizes are bucketed to powers
of two of the chunk size, so cycling sizes compiles at most
log2(max_chunks) sampler variants (train/loop.SamplerBank).

Pipelining: up to ``--pipeline-depth`` requests are dispatched to the
device before the oldest is fetched — the per-request host fetch (~100+ ms
through a remote-TPU tunnel) overlaps device compute, exactly the bench.py
pipelined-serving mode. Tokens are unaffected (dispatch order == request
order; each request's rng is independent). Diagnostics go to stderr; stdout
carries only protocol lines.

Coalescing (dynamic batching; ``--no-coalesce`` to disable): consecutive
seedless requests already buffered in the input merge into one device
chunk while their total fits ``--batch`` — a burst of small requests
packs one dispatch instead of paying a full chunk each, with zero added
latency. Seeded requests never coalesce (their bitwise contract above).
"""

from __future__ import annotations

import argparse
import io
import json
import os
import select
import sys
import tempfile
import time
from collections import deque

import jax
import numpy as np

from ark_tpu.experiments.conditioned import (
    _layout_from_config,
    build_from_checkpoint,
    load_run_checkpoint,
    to_labeled_triples,
)
from ark_tpu.experiments.generate import make_serving_mesh
from ark_tpu.data.tokenizer import seqs_to_triples_batch


class ServeSession:
    """Checkpoint + compiled samplers + request accounting for one daemon."""

    def __init__(self, ckpt_path: str, batch: int = 256,
                 temperature: float = 1.0, top_p: float = 0.9,
                 top_k: int = 0, greedy: bool = False, seed: int = 0,
                 model_type: str | None = None,
                 sample_strategy: str = "auto", mesh: str = "auto",
                 shard_vocab: bool = False, fmt: str = "labels",
                 verify: bool = False, max_n: int = 65536):
        if fmt not in ("labels", "ints", "none"):
            raise ValueError(f"format must be labels|ints|none, got {fmt!r}")
        config, state, vocabs = load_run_checkpoint(ckpt_path)
        if (fmt == "labels" or verify) and (
                not isinstance(vocabs, dict) or vocabs.get("i2e") is None
                or vocabs.get("i2r") is None):
            raise ValueError("checkpoint vocabs lack 'i2e'/'i2r'; label "
                             "decoding (--format labels / --verify) needs "
                             "them — use --format ints or none")
        model, params, cfg, kind = build_from_checkpoint(config, state,
                                                         model_type)
        self.layout = _layout_from_config(cfg)
        self.cfg, self.vocabs, self.kind = cfg, vocabs, kind
        self.fmt, self.max_n, self.batch = fmt, int(max_n), int(batch)
        self.greedy = bool(greedy and kind == "decoder_only")
        mesh_obj, shard_vocab, params = make_serving_mesh(mesh, shard_vocab,
                                                          params)
        self.params = params
        self._rng = jax.random.key(int(seed))
        self._served = 0
        self._graphs = 0
        self._ms_total = 0.0

        from ark_tpu.train.loop import SamplerBank
        self.bank = SamplerBank(
            model, self.layout,
            dict(cfg, sample_chunk=self.batch, temperature=temperature,
                 top_p=top_p, top_k=top_k,
                 fused_sample_strategy=sample_strategy),
            mesh=mesh_obj, shard_vocab=shard_vocab)
        if self.greedy:
            # deterministic argmax decode (generate.py's --greedy), chunked
            # by hand; ride the mesh only when the batch divides 'data'
            from ark_tpu.sample import make_sampler
            nd = (1 if mesh_obj is None
                  else dict(mesh_obj.shape).get("data", 1))
            smp_mesh = mesh_obj if self.batch % nd == 0 else None
            self._greedy_sampler = make_sampler(
                model, self.layout, sample=False, mesh=smp_mesh,
                shard_vocab=shard_vocab and smp_mesh is not None)

        self.verifier = None
        if verify:
            from ark_tpu.eval.verifiers import get_verifier
            name = cfg.get("dataset")
            if not name:
                raise ValueError("--verify needs a dataset name in the "
                                 "checkpoint config")
            self.verifier = get_verifier(name)

    # -- request lifecycle ---------------------------------------------------

    def validate(self, req: dict) -> int:
        """Check a data request; returns its n or raises ValueError."""
        if not isinstance(req, dict):
            raise ValueError("request must be a JSON object")
        n = int(req.get("n", 0))
        if n <= 0:
            raise ValueError("'n' must be a positive integer")
        if n > self.max_n:
            raise ValueError(f"'n'={n} exceeds --max-n {self.max_n}")
        return n

    def coalescible(self, req) -> bool:
        """True if this request may share a device dispatch with its
        neighbors: a valid seedless data request (seeded requests keep
        the bitwise generate-CLI contract, so they always dispatch
        alone)."""
        try:
            return isinstance(req, dict) and "cmd" not in req \
                and req.get("seed") is None and 0 < self.validate(req)
        except (ValueError, TypeError):
            return False

    def dispatch(self, reqs) -> dict:
        """Queue one request — or one coalesced GROUP of seedless
        requests — on the device (async; returns immediately). A group
        draws a single key from the daemon stream and shares one chunk
        dispatch; responses are sliced per request in finish()."""
        if isinstance(reqs, dict):
            reqs = [reqs]
        ns = [self.validate(r) for r in reqs]
        n = sum(ns)
        seed = reqs[0].get("seed") if len(reqs) == 1 else None
        if seed is not None:
            key = jax.random.key(int(seed))
        else:
            self._rng, key = jax.random.split(self._rng)
        t0 = time.monotonic()
        if self.greedy:
            dev, got = [], 0
            while got < n:
                key, k = jax.random.split(key)
                dev.append(self._greedy_sampler(self.params, k, self.batch))
                got += self.batch
        elif self.kind == "decoder_only":
            dev = self.bank.sample_sequences_device(self.params, key, n)
        else:
            dev = self.bank.sample_latent_sequences_device(self.params, key, n)
        return {"reqs": reqs, "ns": ns, "n": n, "dev": dev, "t0": t0}

    def finish(self, rec: dict) -> list[dict]:
        """Fetch the device result, decode, and build the response(s) —
        one per request in the (possibly coalesced) record, in order.

        ``ms`` is dispatch→response wall time: with --pipeline-depth > 1 it
        includes host-side queueing while newer requests were read, so use
        depth 1 for per-request latency probing. ``host_ms`` (fetch+decode
        only, whole record) is pipeline-invariant."""
        n = rec["n"]
        t_host = time.monotonic()
        if isinstance(rec["dev"], list):  # greedy chunks
            seqs = np.concatenate([np.asarray(a) for a in rec["dev"]])[:n]
        else:
            seqs = np.asarray(rec["dev"])
        ms = (time.monotonic() - rec["t0"]) * 1000.0
        host_ms = None  # computed after the shared decode work
        graphs_lbl = all_ints = None
        if self.fmt == "labels" or self.verifier is not None:
            graphs_lbl = to_labeled_triples(seqs, self.cfg, self.vocabs,
                                            verbose=False)
        if self.fmt == "ints":
            all_ints = seqs_to_triples_batch(seqs, self.cfg["special_tokens"],
                                             self.cfg["ENT_BASE"],
                                             self.cfg["REL_BASE"])
        host_ms = round((time.monotonic() - t_host) * 1000.0, 2)

        resps, off = [], 0
        for req, rn in zip(rec["reqs"], rec["ns"]):
            resp = {"id": req.get("id"), "n": rn, "ms": round(ms, 2)}
            if self.fmt == "labels":
                resp["graphs"] = [[list(t) for t in g]
                                  for g in graphs_lbl[off:off + rn]]
            elif self.fmt == "ints":
                resp["graphs"] = [[[int(h), int(r), int(t)] for h, r, t in g]
                                  for g in all_ints[off:off + rn]]
            if self.verifier is not None:
                mine = graphs_lbl[off:off + rn]
                nv = sum(1 for g in mine
                         if self.verifier.check_rules_for_graph(g))
                resp["n_valid"] = nv
                resp["valid_rate"] = nv / max(1, len(mine))
            resp["host_ms"] = host_ms
            if len(rec["reqs"]) > 1:
                resp["coalesced"] = len(rec["reqs"])
            self._served += 1
            self._graphs += rn
            self._ms_total += ms
            resps.append(resp)
            off += rn
        return resps

    def stats(self) -> dict:
        return {"ok": True, "requests": self._served, "graphs": self._graphs,
                "avg_ms": round(self._ms_total / max(1, self._served), 2)}

    def warmup(self, sizes) -> None:
        """Pre-compile the sampler buckets for the given request sizes."""
        for n in sizes:
            t0 = time.monotonic()
            self.finish(self.dispatch({"n": int(n), "seed": 0}))
            print(f"[serve] warmed n={n} in "
                  f"{time.monotonic() - t0:.1f}s", file=sys.stderr)
        # warmup must not perturb request accounting or the rng stream
        self._served = 0
        self._graphs = 0
        self._ms_total = 0.0


def _readable(f) -> bool:
    """True if a read would not block. Non-selectable inputs (StringIO,
    regular files on some platforms) are treated as always readable."""
    try:
        r, _, _ = select.select([f], [], [], 0)
        return bool(r)
    except (ValueError, OSError, io.UnsupportedOperation):
        return True


def serve_loop(inp, out, session: ServeSession, depth: int = 2,
               coalesce: bool = True) -> None:
    """Read JSONL requests from ``inp``, write JSONL responses to ``out``.

    Responses are emitted in request order. Up to ``depth`` records ride
    the device concurrently; when the input has no data ready, pending
    work is flushed so an interactive client always gets its response.
    Control commands and errors drain pending work first (strict output
    ordering).

    Coalescing (``--no-coalesce`` to disable): consecutive seedless data
    requests ALREADY BUFFERED in the input merge into one device record
    while their total fits one ``--batch`` chunk — a stream of small
    requests packs the chunk instead of paying a full dispatch each. No
    added latency (only data a read would return without blocking is
    merged); seeded requests keep the bitwise generate-CLI contract and
    never coalesce; a coalesced group draws ONE key from the daemon
    stream (seedless draws have no bitwise contract — the stream stays
    deterministic for a given input sequence)."""
    depth = max(1, int(depth))
    pending = deque()
    held = None  # one parsed-but-unprocessed item from coalesce lookahead
    trace_left = 0  # data requests still to capture under jax.profiler

    def emit(obj):
        out.write(json.dumps(obj) + "\n")
        out.flush()

    def _stop_trace():
        nonlocal trace_left
        if not trace_left:
            return
        trace_left = 0
        try:
            import jax

            jax.profiler.stop_trace()
            print("[ark_tpu.serve] profiler trace complete",
                  file=sys.stderr, flush=True)
        except Exception as e:
            print(f"[ark_tpu.serve] stop_trace failed: {e}",
                  file=sys.stderr, flush=True)

    def flush_one():
        rec = pending.popleft()
        try:
            for resp in session.finish(rec):
                emit(resp)
        except Exception as e:  # a failed fetch/decode must not kill the
            # daemon either — every client still gets its response line
            for req in rec["reqs"]:
                emit({"ok": False, "id": req.get("id"),
                      "error": f"finish failed: {e}"})

    def next_item(block):
        """('req', obj) | ('badjson', msg) | ('eof',) | None (not ready)."""
        nonlocal held
        if held is not None:
            it, held = held, None
            return it
        if not block and not _readable(inp):
            return None
        line = inp.readline()
        if not line:
            return ("eof",)
        line = line.strip()
        if not line:
            return ("blank",)
        try:
            return ("req", json.loads(line))
        except json.JSONDecodeError as e:
            return ("badjson", f"bad json: {e}")

    eof = False
    while not eof or pending:
        has_input = held is not None or _readable(inp)
        if pending and (eof or len(pending) >= depth or not has_input):
            flush_one()
            continue
        it = next_item(block=True)
        if it[0] == "eof":
            eof = True
            continue
        if it[0] == "blank":
            continue
        if it[0] == "badjson":
            while pending:
                flush_one()
            emit({"ok": False, "error": it[1]})
            continue
        req = it[1]
        cmd = req.get("cmd") if isinstance(req, dict) else None
        if cmd is not None:
            while pending:
                flush_one()
            if cmd == "ping":
                emit({"ok": True})
            elif cmd == "stats":
                emit(session.stats())
            elif cmd == "shutdown":
                _stop_trace()
                emit({"ok": True, "shutdown": True})
                return
            elif cmd == "trace":
                # {"cmd": "trace", "n": K, "dir": "..."} — capture a
                # jax.profiler trace (XLA device + host timelines,
                # viewable in xprof/perfetto) around the NEXT K data
                # requests. Production debuggability: answer "why is
                # this request slow" on a live daemon without a restart.
                tdir = req.get("dir") or os.path.join(
                    tempfile.gettempdir(), "ark_tpu_serve_trace")
                try:
                    import jax

                    jax.profiler.start_trace(tdir)
                    trace_left = max(1, int(req.get("n", 1)))
                    emit({"ok": True, "trace_dir": tdir, "n": trace_left})
                except Exception as e:
                    emit({"ok": False, "error": f"start_trace: {e}"})
            else:
                emit({"ok": False, "error": f"unknown cmd {cmd!r}"})
            continue
        group = [req]
        if coalesce and session.coalescible(req):
            total = session.validate(req)
            while total < session.batch:
                nxt = next_item(block=False)
                if nxt is None:
                    break
                if nxt[0] == "eof":
                    eof = True
                    break
                if nxt[0] == "blank":
                    continue
                if (nxt[0] != "req" or not session.coalescible(nxt[1])
                        or total + session.validate(nxt[1]) > session.batch):
                    held = nxt  # process it on the next loop pass
                    break
                group.append(nxt[1])
                total += session.validate(nxt[1])
        try:
            pending.append(session.dispatch(group))
            if trace_left:
                trace_left -= 1
                if trace_left == 0:
                    # the host fetch must land inside the trace window
                    while pending:
                        flush_one()
                    trace_left = 1  # re-arm the guard for _stop_trace
                    _stop_trace()
        except Exception as e:  # bad request must not kill the daemon
            while pending:
                flush_one()
            for r in group:
                rid = r.get("id") if isinstance(r, dict) else None
                emit({"ok": False, "id": rid, "error": str(e)})
    _stop_trace()  # input closed mid-capture: finalize the trace files


def main(argv=None):
    p = argparse.ArgumentParser("ARK-TPU serving daemon (JSONL protocol)")
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--batch", type=int, default=256,
                   help="device chunk size (requests are split into chunks "
                        "of this size; one compiled scan per pow2 bucket)")
    p.add_argument("--temperature", type=float, default=1.0)
    p.add_argument("--top-p", type=float, default=0.9)
    p.add_argument("--top-k", type=int, default=0)
    p.add_argument("--greedy", action="store_true",
                   help="deterministic argmax decode (LM checkpoints)")
    p.add_argument("--seed", type=int, default=0,
                   help="daemon rng stream for requests without a seed")
    p.add_argument("--model-type", default=None)
    p.add_argument("--mesh", default="auto", choices=["auto", "off"])
    p.add_argument("--shard-vocab", action="store_true")
    p.add_argument("--sample-strategy", default="auto",
                   choices=["auto", "gumbel", "expmin", "cdf"])
    p.add_argument("--pipeline-depth", type=int, default=2,
                   help="requests in flight on the device (1 = serial)")
    p.add_argument("--no-coalesce", action="store_true",
                   help="disable merging buffered small seedless requests "
                        "into one device chunk (dynamic batching)")
    p.add_argument("--format", default="labels",
                   choices=["labels", "ints", "none"],
                   help="'none' omits graphs (latency/validity probing)")
    p.add_argument("--verify", action="store_true",
                   help="attach n_valid/valid_rate (semantic rules) to "
                        "each response")
    p.add_argument("--max-n", type=int, default=65536,
                   help="reject requests larger than this")
    p.add_argument("--warmup", default="",
                   help="comma-separated request sizes to pre-compile")
    p.add_argument("--input", default=None, help="file (default: stdin)")
    p.add_argument("--output", default=None, help="file (default: stdout)")
    args = p.parse_args(argv)
    # one TPU job at a time (no-op on the cpu platform): a serving daemon
    # holds the device lock for its whole lifetime
    from ark_tpu.utils.device_lock import acquire_device_lock
    acquire_device_lock(tag="serve")

    session = ServeSession(
        args.checkpoint, batch=args.batch, temperature=args.temperature,
        top_p=args.top_p, top_k=args.top_k, greedy=args.greedy,
        seed=args.seed, model_type=args.model_type,
        sample_strategy=args.sample_strategy, mesh=args.mesh,
        shard_vocab=args.shard_vocab, fmt=args.format, verify=args.verify,
        max_n=args.max_n)
    if args.warmup:
        session.warmup(int(s) for s in args.warmup.split(",") if s.strip())
    print("[serve] ready", file=sys.stderr)

    inp = open(args.input) if args.input else sys.stdin
    out = open(args.output, "w") if args.output else sys.stdout
    try:
        serve_loop(inp, out, session, depth=args.pipeline_depth,
                   coalesce=not args.no_coalesce)
    finally:
        if args.input:
            inp.close()
        if args.output:
            out.close()
    return session


if __name__ == "__main__":
    main()
