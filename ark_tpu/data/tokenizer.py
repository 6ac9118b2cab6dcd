"""Tokenization: the exact vocab layout and seq<->triples converters of the
reference (kgvae/model/utils.py:66-108, kgvae/experiments/train.py:332-348).

Vocabulary layout:
    PAD=0, BOS=1, EOS=2
    entity token ids:   ENT_BASE + entity_index,   ENT_BASE = 3
    relation token ids: REL_BASE + relation_index, REL_BASE = 3 + num_entities
    vocab_size = REL_BASE + num_relations
    seq_len    = 1 + max_edges * 3 + 1

For padded (wd-*) datasets an extra PAD entity id (= num_entities) and PAD
relation id (= num_relations) are appended, growing both counts by one
(reference train.py:334-338).

Sequence layout per graph:
    [BOS, h0+ENT_BASE, r0+REL_BASE, t0+ENT_BASE, h1+..., ..., EOS, PAD...]
"""

from __future__ import annotations

import dataclasses

import numpy as np

SPECIAL_TOKENS = {"PAD": 0, "BOS": 1, "EOS": 2}
ENT_BASE = 3


@dataclasses.dataclass(frozen=True)
class VocabLayout:
    """Derived vocabulary geometry threaded through models, samplers and eval."""

    num_entities: int       # incl. PAD entity if use_padding
    num_relations: int      # incl. PAD relation if use_padding
    pad_eid: int | None
    pad_rid: int | None
    ent_base: int
    rel_base: int
    vocab_size: int
    seq_len: int
    max_edges: int
    min_edges: int
    use_padding: bool

    @property
    def special_tokens(self):
        return dict(SPECIAL_TOKENS)


def build_vocab_layout(num_entities: int, num_relations: int, min_edges: int,
                       max_edges: int, use_padding: bool) -> VocabLayout:
    """Reference semantics: train.py:330-348."""
    pad_eid = pad_rid = None
    if use_padding:
        pad_eid = num_entities
        pad_rid = num_relations
        num_entities += 1
        num_relations += 1
    rel_base = ENT_BASE + num_entities
    vocab_size = rel_base + num_relations
    seq_len = 1 + max_edges * 3 + 1
    return VocabLayout(
        num_entities=num_entities,
        num_relations=num_relations,
        pad_eid=pad_eid,
        pad_rid=pad_rid,
        ent_base=ENT_BASE,
        rel_base=rel_base,
        vocab_size=vocab_size,
        seq_len=seq_len,
        max_edges=max_edges,
        min_edges=min_edges,
        use_padding=use_padding,
    )


def triples_to_seq(triples, special_tokens, ent_base, rel_base, seq_len):
    """[BOS, h+EB, r+RB, t+EB, ..., EOS, PAD...] (reference utils.py:102-108).

    Returns a python list of ints (array encoding lives in dataset.py)."""
    seq = [special_tokens["BOS"]]
    for h, r, t in triples:
        seq += [ent_base + h, rel_base + r, ent_base + t]
    seq.append(special_tokens["EOS"])
    seq += [special_tokens["PAD"]] * (seq_len - len(seq))
    return seq


def seq_to_triples(seq, special_tokens, ent_base, rel_base):
    """Inverse walk, 3 tokens at a time from position 1 until EOS
    (reference utils.py:70-78). Accepts lists or arrays."""
    seq = list(np.asarray(seq).tolist()) if not isinstance(seq, list) else seq
    triples, i = [], 1
    while i + 2 < len(seq) and seq[i] != special_tokens["EOS"]:
        h, r, t = seq[i], seq[i + 1], seq[i + 2]
        triples.append((h - ent_base, r - rel_base, t - ent_base))
        i += 3
    return triples


def seqs_to_triples_batch(seqs, special_tokens, ent_base, rel_base):
    """Vectorized ``seq_to_triples`` over a [N, L] int array.

    Matches the reference walk (utils.py:70-78) exactly: triples are read
    3-at-a-time from position 1; the walk stops at the first EOS found at a
    triple-head position (EOS in relation/tail slots does NOT stop it)."""
    seqs = np.asarray(seqs)
    n, L = seqs.shape
    k = (L - 2) // 3
    eos = special_tokens["EOS"]
    body = seqs[:, 1:1 + 3 * k].reshape(n, k, 3).astype(np.int64)
    heads_not_eos = body[:, :, 0] != eos
    keep = np.cumprod(heads_not_eos, axis=1).astype(bool)
    body = body.copy()
    body[:, :, 0] -= ent_base
    body[:, :, 1] -= rel_base
    body[:, :, 2] -= ent_base
    out = []
    for i in range(n):
        m = keep[i]
        out.append([tuple(t) for t in body[i, m].tolist()])
    return out


def ints_to_labels(graphs, i2e, i2r, verbose=True):
    """Map int triples to labels, silently dropping out-of-vocab triples with a
    warning count (reference utils.py:81-94)."""
    result = []
    skipped = 0
    for g in graphs:
        clean = []
        for h, r, t in g:
            if h in i2e and r in i2r and t in i2e:
                clean.append((i2e[h], i2r[r], i2e[t]))
            else:
                skipped += 1
        result.append(clean)
    if skipped > 0 and verbose:
        print(f"[!] Skipped {skipped} invalid triples")
    return result


def canonicalize(triples, i2e=None, i2r=None, mode="keep"):
    """'keep' keeps dataset order; 'alpha_name' sorts by label triple
    (reference utils.py:96-99)."""
    if mode == "keep":
        return triples
    return sorted(triples, key=lambda x: (i2e[x[0]], i2r[x[1]], i2e[x[2]]))


def canonical_graph_string(graph):
    """Dedup key for graph diversity metrics (reference utils.py:66-67)."""
    return str(sorted(graph))
