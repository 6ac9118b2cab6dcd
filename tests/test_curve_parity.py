"""Empirical training-curve parity vs PyTorch (SURVEY §7 hard-part 2:
"parity = matching converged values/curve shape on syn-paths, verified
empirically"). The reference itself cannot run here (its intelligraphs
dependency is absent), so the oracle is a torch twin of the model trained
on the identical data stream: same graphs, same batch order, same
architecture/optimizer/loss, independent same-distribution inits. Curves
must track closely.
"""

import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from ark_tpu.data import load_data_as_list
from ark_tpu.data.dataset import encode_graphs
from ark_tpu.data.tokenizer import build_vocab_layout
from ark_tpu.models import build_model
from ark_tpu.train import create_train_state, make_train_step

D_MODEL, N_LAYERS, BATCH, STEPS, LR = 64, 2, 64, 240, 1e-3


def _data():
    train_g, *_rest = load_data_as_list("syn-paths")[:1]
    train_g, val_g, test_g, (e2i, i2e), (r2i, i2r), (mn, mx), _ = \
        load_data_as_list("syn-paths")
    layout = build_vocab_layout(len(e2i), len(r2i), mn, mx, False)
    data = encode_graphs(train_g, layout)
    return data, layout


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


def test_loss_curve_tracks_torch(small_datasets):
    data, layout = _data()
    n = STEPS * BATCH
    reps = int(np.ceil(n / len(data)))
    seq_np = np.tile(data.seq, (reps, 1))[:n]

    # ---- torch side
    torch.manual_seed(0)
    tm = TorchGRULM(layout.vocab_size, D_MODEL, N_LAYERS, layout.seq_len)
    topt = torch.optim.Adam(tm.parameters(), lr=LR)
    tlosses = []
    for i in range(STEPS):
        batch = torch.tensor(seq_np[i * BATCH:(i + 1) * BATCH].astype(np.int64))
        topt.zero_grad()
        logits = tm(batch[:, :-1])
        loss = F.cross_entropy(logits.reshape(-1, layout.vocab_size),
                               batch[:, 1:].reshape(-1), ignore_index=0)
        loss.backward()
        topt.step()
        tlosses.append(float(loss))

    # ---- ark_tpu side (identical data order; dropout off to match twin)
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

    t = np.asarray(tlosses)
    j = np.asarray(jlosses)
    # same starting point (both ~ log V at init), same descent, close tail
    assert abs(t[0] - j[0]) < 0.2, (t[0], j[0])
    assert j[-1] < j[0] * 0.75 and t[-1] < t[0] * 0.75
    tail_t, tail_j = t[-40:].mean(), j[-40:].mean()
    assert abs(tail_t - tail_j) < 0.1, (tail_t, tail_j)
    # curve shape: mean absolute gap over a smoothed curve
    k = np.ones(20) / 20
    ts = np.convolve(t, k, mode="valid")
    js = np.convolve(j, k, mode="valid")
    assert np.abs(ts - js).mean() < 0.12, np.abs(ts - js).mean()
