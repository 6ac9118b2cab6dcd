"""Beam search for SAIL latent decoding, faithful to the reference's
``beam_generate`` (models.py:283-300) including its quirks (SURVEY Q-3):

  - candidates are ranked by the BATCH-MEAN log-probability (``lp.mean()``,
    models.py:296) — one shared beam ordering across the whole batch, not
    per-sequence beam search;
  - expansion stops early only when every kept beam's last token is EOS for
    every batch row (models.py:297-298);
  - the best beam's sequences are returned (possibly shorter than seq_len;
    we right-pad with EOS, which decodes identically through seq_to_triples).

Implemented as a ``lax.while_loop`` over a static-size token buffer with
per-beam decode states (KV caches / GRU hidden) instead of the reference's
full-prefix re-encode per candidate per step.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _gather_beam(tree, idx):
    return jax.tree.map(lambda x: x[idx], tree)


def beam_generate_per_row(model, params, layout, z, *, beam=4):
    """Per-row beam search: every batch row runs its own beam (the
    "correct" beam the reference's batch-mean ranking approximates; SURVEY
    Q-3). For a single row this is EXACTLY the reference algorithm, so the
    latent-analysis probes batch their single-z decodes through this and get
    bit-identical results to looped B=1 ``beam_generate`` calls at a
    fraction of the dispatches (tests/test_sampling.py).

    z [B, d_latent] -> int32 sequences [B, seq_len] (each row's best beam).
    """
    st = layout.special_tokens
    bos, eos = st["BOS"], st["EOS"]
    L = layout.seq_len
    B = z.shape[0]

    @jax.jit
    def run(params, z):
        # states laid out flat over (row, beam) = B*beam "rows"
        zb = jnp.repeat(z, beam, axis=0)                      # [B*beam, d]
        states = model.decode_state(params, zb)
        seqs = jnp.full((B, beam, L), eos, jnp.int32).at[:, :, 0].set(bos)
        lps = jnp.full((B, beam), -jnp.inf, jnp.float32).at[:, 0].set(0.0)
        tokens = jnp.full((B, beam), bos, jnp.int32)
        row_done = jnp.zeros((B,), bool)

        def cond(carry):
            t, seqs, lps, tokens, states, row_done = carry
            return (t < L - 1) & ~jnp.all(row_done)

        def body(carry):
            t, seqs, lps, tokens, states, row_done = carry
            logits, new_states = model.decode_step(
                params, states, tokens.reshape(B * beam), t)
            logp = jax.nn.log_softmax(
                logits.astype(jnp.float32), axis=-1).reshape(B, beam, -1)
            top_lp, ids = jax.lax.top_k(logp, beam)           # [B, beam, beam]
            cand_lp = (lps[:, :, None] + top_lp).reshape(B, beam * beam)
            new_lps, flat_idx = jax.lax.top_k(cand_lp, beam)  # per row
            parent = flat_idx // beam                         # [B, beam]
            new_tokens = jnp.take_along_axis(
                ids.reshape(B, beam * beam), flat_idx, axis=-1).astype(jnp.int32)
            # frozen rows keep their beams untouched
            parent = jnp.where(row_done[:, None], jnp.arange(beam)[None], parent)
            new_lps = jnp.where(row_done[:, None], lps, new_lps)
            new_tokens = jnp.where(row_done[:, None], tokens, new_tokens)

            gather = parent + jnp.arange(B)[:, None] * beam   # flat indices
            states = jax.tree.map(
                lambda new, old: jnp.where(
                    jnp.expand_dims(row_done.repeat(beam),
                                    tuple(range(1, new.ndim))),
                    old, new[gather.reshape(-1)]),
                new_states, states)
            new_seqs = jnp.take_along_axis(seqs, parent[:, :, None], axis=1)
            new_seqs = jnp.where(row_done[:, None, None], seqs,
                                 new_seqs.at[:, :, t + 1].set(new_tokens))
            row_done = row_done | jnp.all(new_tokens == eos, axis=1)
            return (t + 1, new_seqs, new_lps, new_tokens, states, row_done)

        carry = (jnp.int32(0), seqs, lps, tokens, states, row_done)
        _, seqs, lps, _, _, _ = jax.lax.while_loop(cond, body, carry)
        best = jnp.argmax(lps, axis=1)
        return jnp.take_along_axis(seqs, best[:, None, None], axis=1)[:, 0]

    return run(params, z)


def beam_generate(model, params, layout, z, *, beam=4):
    """z [B, d_latent] -> int32 sequences [B, seq_len]."""
    st = layout.special_tokens
    bos, eos = st["BOS"], st["EOS"]
    L = layout.seq_len
    B = z.shape[0]

    @functools.partial(jax.jit, static_argnums=())
    def run(params, z):
        state0 = model.decode_state(params, z)
        # beam axis in front; beam 0 is the live start, others start at -inf
        states = jax.tree.map(
            lambda x: jnp.broadcast_to(x[None], (beam,) + x.shape), state0)
        seqs = jnp.full((beam, B, L), eos, jnp.int32)
        seqs = seqs.at[:, :, 0].set(bos)
        lps = jnp.full((beam, B), -jnp.inf, jnp.float32).at[0].set(0.0)
        tokens = jnp.full((beam, B), bos, jnp.int32)

        def cond(carry):
            t, seqs, lps, tokens, states = carry
            live = jnp.isfinite(lps.mean(axis=1))
            done = jnp.all(jnp.where(live[:, None], tokens == eos, True))
            return (t < L - 1) & ~done

        def body(carry):
            t, seqs, lps, tokens, states = carry
            step = jax.vmap(lambda s, tok: model.decode_step(params, s, tok, t),
                            in_axes=(0, 0))
            logits, states = step(states, tokens)          # [beam, B, V]
            logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
            top_lp, ids = jax.lax.top_k(logp, beam)        # [beam, B, beam]
            cand_lp = lps[:, :, None] + top_lp             # [beam, B, beam]
            key = cand_lp.mean(axis=1).reshape(-1)         # [beam*beam]
            _, flat_idx = jax.lax.top_k(key, beam)
            parent = flat_idx // beam
            kk = flat_idx % beam
            new_tokens = jnp.take_along_axis(
                ids[parent], kk[:, None, None], axis=-1)[:, :, 0]
            new_lps = jnp.take_along_axis(cand_lp[parent], kk[:, None, None],
                                          axis=-1)[:, :, 0]
            new_states = _gather_beam(states, parent)
            new_seqs = seqs[parent].at[:, :, t + 1].set(new_tokens)
            return (t + 1, new_seqs, new_lps, new_tokens.astype(jnp.int32),
                    new_states)

        carry = (jnp.int32(0), seqs, lps, tokens, states)
        _, seqs, lps, _, _ = jax.lax.while_loop(cond, body, carry)
        best = jnp.argmax(lps.mean(axis=1))
        return seqs[best]

    return run(params, z)
