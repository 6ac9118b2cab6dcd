"""Index-level verification helpers mirroring the reference's
``verify_generated_graphs`` / ``sample_and_verify``
(kgvae/model/verification.py:19-120, V-3 in SURVEY §2).

In the reference these are dead code, and ``sample_and_verify`` would crash
(it calls a nonexistent ``model.sample``; reference verification.py:109).
Working equivalents are provided: the sampling hook is the real ark_tpu
sampler.
"""

from __future__ import annotations

import jax
import numpy as np

from ark_tpu.data.tokenizer import seqs_to_triples_batch


def verify_generated_graphs(generated_triples, verifier, i2e, i2r):
    """Index-level validity + violation tally (reference verification.py:19-83).

    generated_triples: int array [batch, num_triples, 3]; padding rows are
    all-zero (the reference's convention there).
    """
    generated_triples = np.asarray(generated_triples)
    batch_size = generated_triples.shape[0]
    valid_count = 0
    invalid_reasons = []
    for i in range(batch_size):
        graph = generated_triples[i]
        graph = graph[(graph != 0).any(axis=1)]
        if len(graph) == 0:
            invalid_reasons.append("empty_graph")
            continue
        labeled = []
        for s, r, o in graph.tolist():
            if s in i2e and o in i2e and r in i2r:
                labeled.append([i2e[s], i2r[r], i2e[o]])
        if len(labeled) == 0:
            invalid_reasons.append("all_padding")
            continue
        violations = verifier.evaluate_graph(labeled)
        if len(violations) == 0:
            valid_count += 1
        else:
            for violation_msg, _ in violations:
                invalid_reasons.append(violation_msg)
    return {
        "valid_count": valid_count,
        "total_count": batch_size,
        "validity_rate": valid_count / batch_size if batch_size else 0.0,
        "invalid_reasons": invalid_reasons,
    }


def sample_and_verify(model, params, layout, config, verifier, i2e, i2r,
                      num_samples=100, rng=None):
    """Sample graphs and verify them (fixed version of reference
    verification.py:86-120 — the reference's crashes on ``model.sample``)."""
    from ark_tpu.sample import decode_latent, generate

    rng = rng if rng is not None else jax.random.key(0)
    if model.kind == "vae":
        rng, kz = jax.random.split(rng)
        z = jax.random.normal(kz, (num_samples, config["d_latent"]))
        seqs = decode_latent(model, params, layout, z, beam=1)
    else:
        seqs = generate(model, params, layout, rng, num_samples, sample=True,
                        temperature=config.get("temperature", 1.0),
                        top_p=config.get("top_p", 0.9),
                        top_k=config.get("top_k", 0))
    graphs = seqs_to_triples_batch(np.asarray(seqs), layout.special_tokens,
                                   layout.ent_base, layout.rel_base)
    n = max(len(g) for g in graphs) if graphs else 1
    arr = np.zeros((len(graphs), max(n, 1), 3), np.int64)
    for i, g in enumerate(graphs):
        if g:
            arr[i, :len(g)] = np.asarray(g)
    return verify_generated_graphs(arr, verifier, i2e, i2r)


def count_unique_graphs(model, params, layout, d_latent, num_samples=1000,
                        beam=1, rng=None):
    """Graph diversity from random latents (reference models.py:269-279)."""
    from ark_tpu.data.tokenizer import canonical_graph_string
    from ark_tpu.sample import decode_latent

    rng = rng if rng is not None else jax.random.key(0)
    z = jax.random.normal(rng, (num_samples, d_latent))
    seqs = decode_latent(model, params, layout, z, beam=beam)
    graphs = seqs_to_triples_batch(np.asarray(seqs), layout.special_tokens,
                                   layout.ent_base, layout.rel_base)
    unique = {canonical_graph_string(g) for g in graphs}
    print(f"\n[Graph Diversity from {num_samples} Random Latents]")
    print(f"  Unique graphs generated: {len(unique)}")
    print(f"  Diversity ratio: {len(unique) / num_samples:.3f}")
    return unique


def generate_test_graphs(model, params, layout, test_data, beam_width=4,
                         num_generated_test_graphs=1000, rng=None,
                         batch_size=64):
    """Encode test graphs and decode them back through beam search
    (reference models.py:303-315)."""
    import jax.numpy as jnp

    from ark_tpu.sample import decode_latent

    rng = rng if rng is not None else jax.random.key(0)
    out = []
    n = min(len(test_data), num_generated_test_graphs)
    for start in range(0, n, batch_size):
        stop = min(start + batch_size, n)
        take = stop - start
        tr = np.zeros((batch_size,) + test_data.triples.shape[1:],
                      test_data.triples.dtype)
        tr[:take] = test_data.triples[start:stop]
        rng, k = jax.random.split(rng)
        z, _, _ = model.encode(params, jnp.asarray(tr), k)
        # decode only the real rows: the batch-mean beam ranking (the
        # reference Q-3 quirk) would otherwise let the zero-padded tail
        # rows' log-probs steer which beams survive for the real rows
        seqs = decode_latent(model, params, layout, z[:take],
                             beam=beam_width)
        graphs = seqs_to_triples_batch(np.asarray(seqs),
                                       layout.special_tokens,
                                       layout.ent_base, layout.rel_base)
        out.extend(graphs)
    return out[:num_generated_test_graphs]
