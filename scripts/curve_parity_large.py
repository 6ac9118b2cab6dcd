#!/usr/bin/env python
"""Large-scale torch-oracle training-curve parity (round-5 VERDICT item 7).

Scales tests/test_curve_parity.py's twin-model protocol up (d_model 256,
3 layers, 1000 steps on syn-paths) so the parity claim rests on a real
optimization trajectory, not only the entropy-floor argument: the SAME
data stream, batch order, architecture, Adam hyperparameters and loss feed
a torch GRU LM (the reference's DecoderOnlyGRU shape,
/root/reference/kgvae/model/models.py:323-345) and the ark_tpu ARK model;
inits are independent draws from the same distributions, so the curves
must TRACK (start ~log V, same descent, tails within tolerance), not be
bitwise equal.

Runs on CPU (forces the cpu platform; the torch side is CPU anyway).
Writes:
  runs_r5/curve_parity/curve.jsonl   — one {"step", "torch", "ark_tpu"} per step
  runs_r5/curve_parity/summary.json  — tail means, smoothed mean |gap|
  runs_r5/curve_parity/curve.pdf     — side-by-side plot (if matplotlib)
  stdout                              — a markdown table for QUALITY.md
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import torch  # noqa: E402
import torch.nn.functional as F  # noqa: E402

from ark_tpu.data import load_data_as_list  # noqa: E402
from ark_tpu.data.dataset import encode_graphs  # noqa: E402
from ark_tpu.data.tokenizer import build_vocab_layout  # noqa: E402
from ark_tpu.models import build_model  # noqa: E402
from ark_tpu.train import create_train_state, make_train_step  # noqa: E402

D_MODEL, N_LAYERS, BATCH, STEPS, LR = 256, 3, 64, 1000, 1e-3
OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "runs_r5", "curve_parity")


class TorchGRULM(torch.nn.Module):
    """Twin of DecoderOnlyGRU (reference models.py:323-345)."""

    def __init__(self, vocab, d_model, n_layers, seq_len):
        super().__init__()
        self.tok = torch.nn.Embedding(vocab, d_model)
        self.pos = torch.nn.Embedding(seq_len, d_model)
        self.gru = torch.nn.GRU(d_model, d_model, num_layers=n_layers,
                                batch_first=True, dropout=0.0)
        self.out = torch.nn.Linear(d_model, vocab)
        self.out.weight = self.tok.weight

    def forward(self, s):
        x = self.tok(s) + self.pos(torch.arange(s.shape[1]))[None]
        y, _ = self.gru(x)
        return self.out(y)


def main():
    train_g, val_g, test_g, (e2i, _), (r2i, _), (mn, mx), _ = \
        load_data_as_list("syn-paths")
    layout = build_vocab_layout(len(e2i), len(r2i), mn, mx, False)
    data = encode_graphs(train_g, layout)
    n = STEPS * BATCH
    reps = int(np.ceil(n / len(data)))
    seq_np = np.tile(data.seq, (reps, 1))[:n]

    t0 = time.time()
    torch.manual_seed(0)
    tm = TorchGRULM(layout.vocab_size, D_MODEL, N_LAYERS, layout.seq_len)
    topt = torch.optim.Adam(tm.parameters(), lr=LR)
    tlosses = []
    for i in range(STEPS):
        batch = torch.tensor(
            seq_np[i * BATCH:(i + 1) * BATCH].astype(np.int64))
        topt.zero_grad()
        logits = tm(batch[:, :-1])
        loss = F.cross_entropy(logits.reshape(-1, layout.vocab_size),
                               batch[:, 1:].reshape(-1), ignore_index=0)
        loss.backward()
        topt.step()
        tlosses.append(float(loss))
    print(f"[curve] torch: {time.time()-t0:.0f}s", file=sys.stderr)

    t0 = time.time()
    cfg = dict(model_type="ARK", d_model=D_MODEL, n_layers=N_LAYERS,
               seq_len=layout.seq_len, vocab_size=layout.vocab_size,
               n_entities=layout.num_entities,
               n_relations=layout.num_relations, dec_dropout=0.0)
    m = build_model(cfg)
    state = create_train_state(m, jax.random.key(0))
    step = make_train_step(m, pad_id=0)
    dummy_triples = jnp.zeros((BATCH, layout.max_edges, 3), jnp.int32)
    jlosses = []
    for i in range(STEPS):
        batch = jnp.asarray(seq_np[i * BATCH:(i + 1) * BATCH])
        state, met = step(state, dummy_triples, batch, jax.random.key(i),
                          LR, 1.0)
        jlosses.append(float(met["loss"]))
    print(f"[curve] ark_tpu: {time.time()-t0:.0f}s", file=sys.stderr)

    t = np.asarray(tlosses)
    j = np.asarray(jlosses)
    k = np.ones(20) / 20
    ts = np.convolve(t, k, mode="valid")
    js = np.convolve(j, k, mode="valid")
    summary = {
        "config": {"d_model": D_MODEL, "n_layers": N_LAYERS, "batch": BATCH,
                   "steps": STEPS, "lr": LR, "dataset": "syn-paths"},
        "start": {"torch": round(t[0], 4), "ark_tpu": round(j[0], 4)},
        "tail100_mean": {"torch": round(t[-100:].mean(), 4),
                         "ark_tpu": round(j[-100:].mean(), 4)},
        "smoothed_mean_abs_gap": round(float(np.abs(ts - js).mean()), 4),
        "smoothed_max_abs_gap": round(float(np.abs(ts - js).max()), 4),
    }

    os.makedirs(OUT_DIR, exist_ok=True)
    with open(os.path.join(OUT_DIR, "curve.jsonl"), "w") as f:
        for i in range(STEPS):
            f.write(json.dumps({"step": i, "torch": round(t[i], 4),
                                "ark_tpu": round(j[i], 4)}) + "\n")
    with open(os.path.join(OUT_DIR, "summary.json"), "w") as f:
        json.dump(summary, f, indent=1)

    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        fig, ax = plt.subplots(figsize=(7, 4))
        ax.plot(t, lw=0.5, alpha=0.35, color="tab:orange")
        ax.plot(j, lw=0.5, alpha=0.35, color="tab:blue")
        ax.plot(np.arange(len(ts)) + 10, ts, lw=1.8, color="tab:orange",
                label="torch oracle (GRU twin)")
        ax.plot(np.arange(len(js)) + 10, js, lw=1.8, color="tab:blue",
                label="ark_tpu ARK")
        ax.set_xlabel("step")
        ax.set_ylabel("masked CE (nats)")
        ax.set_title(f"syn-paths, d={D_MODEL} x{N_LAYERS}, batch {BATCH}, "
                     f"Adam {LR}")
        ax.legend()
        fig.tight_layout()
        fig.savefig(os.path.join(OUT_DIR, "curve.pdf"))
    except Exception as e:  # matplotlib is optional here
        print(f"[curve] no plot: {e}", file=sys.stderr)

    # markdown table for docs/QUALITY.md
    print("| step | torch (smoothed) | ark_tpu (smoothed) | gap |")
    print("|---|---|---|---|")
    for s in range(0, len(ts), 100):
        print(f"| {s+10} | {ts[s]:.3f} | {js[s]:.3f} | "
              f"{abs(ts[s]-js[s]):+.3f} |")
    print(f"| tail-100 mean | {summary['tail100_mean']['torch']:.3f} | "
          f"{summary['tail100_mean']['ark_tpu']:.3f} | "
          f"{summary['tail100_mean']['torch']-summary['tail100_mean']['ark_tpu']:+.3f} |")
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
