"""Latent-space analysis for SAIL checkpoints (reference
kgvae/experiments/interpolation.py:1-1019):

  - local-neighborhood perturbation decoding (interp:159-208)
  - line-walk smoothness with local/global overlap (interp:211-289)
  - Jaccard smoothness score over anchors x directions (interp:293-352)
  - flip-rate / basin-length discreteness probe (interp:356-424)
  - wd-movies qualitative analysis: t-SNE by 10 famous genres, a latent
    interpolation path, decoded-graph drawing sequence (interp:428-894)
  - epsilon sweep over [0.02 .. 0.2] (interp:975-1014)

Decoding uses the on-device beam/greedy samplers (ark_tpu/sample) instead of
the reference's per-step host loops.
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import jax
import jax.numpy as jnp

from ark_tpu.data.loader import get_file_paths, parse_files_to_subgraphs, ensure_dataset
from ark_tpu.data.tokenizer import (
    build_vocab_layout,
    ints_to_labels,
    seqs_to_triples_batch,
)
from ark_tpu.models import build_model
from ark_tpu.sample import decode_latent
from ark_tpu.utils.checkpoint import load_checkpoint, to_device_tree
from ark_tpu.utils.logging import Run

TARGET_GENRES = [
    "Action film", "Comedy film", "Drama film", "Horror film", "Romance film",
    "Musical film", "Science fiction film", "Western film", "Bollywood",
    "Documentary film",
]


def jaccard(a: set, b: set) -> float:
    """Reference interp:26-43."""
    if not a and not b:
        return 1.0
    if not a or not b:
        return 0.0
    return len(a & b) / len(a | b)


def load_model(checkpoint_dir, dataset, model_type, epoch=None):
    """Reference interp:104-154: '{dataset}_{model_type}_best_model.pt' or
    the epoch-numbered checkpoint; returns (model, params, config, path,
    vocabs, dataset_meta, layout)."""
    if epoch is None:
        ckpt_path = os.path.join(checkpoint_dir,
                                 f"{dataset}_{model_type}_best_model.pt")
    else:
        ckpt_path = os.path.join(
            checkpoint_dir, f"{dataset}_{model_type}_checkpoint_epoch_{epoch}.pt")
    ckpt = load_checkpoint(ckpt_path)
    config = ckpt["config"]
    if model_type not in ("SAIL", "t-SAIL"):
        raise ValueError(f"Unknown model_type: {model_type}")
    model = build_model(config)
    params = to_device_tree(ckpt["model_state_dict"])
    vocabs = ckpt.get("vocabs")
    meta = ckpt.get("dataset_meta")
    layout = build_vocab_layout(
        config["n_entities"] - (1 if config.get("use_padding") else 0),
        config["n_relations"] - (1 if config.get("use_padding") else 0),
        config.get("min_edges", 1), config["max_edges"],
        bool(config.get("use_padding")))
    return model, params, config, ckpt_path, vocabs, meta, layout


class LatentDecoder:
    """Caches compiled decoders per (beam, batch) shape.

    Batches use PER-ROW beam search (sample/beam.py::beam_generate_per_row),
    which is bit-identical to looping the reference beam over single z's —
    so a whole walk's decodes go through one device dispatch instead of one
    per z (the reference decodes per-z at batch 1, interp:45-78)."""

    def __init__(self, model, params, layout):
        self.model, self.params, self.layout = model, params, layout

    def decode(self, z, beam=3):
        from ark_tpu.sample import beam_generate_per_row

        z = jnp.atleast_2d(jnp.asarray(z, jnp.float32))
        if beam <= 1:
            seqs = decode_latent(self.model, self.params, self.layout, z, beam=1)
        else:
            seqs = beam_generate_per_row(self.model, self.params, self.layout,
                                         z, beam=beam)
        st = self.layout.special_tokens
        return seqs_to_triples_batch(np.asarray(seqs), st,
                                     self.layout.ent_base, self.layout.rel_base)

    def decode_sets(self, zs, beam=3):
        """Batch of z -> list of triple sets (one dispatch)."""
        return [set(tuple(map(int, t)) for t in g)
                for g in self.decode(jnp.asarray(zs), beam)]

    def decode_set(self, z, beam=3) -> set:
        """Reference decode_to_triple_set (interp:45-78): single z -> set."""
        return self.decode_sets(z[None] if z.ndim == 1 else z, beam)[0]


def load_graphs_with_checkpoint_vocab(dataset, e2i, r2i):
    """Reference interp:81-101: raw label graphs remapped to checkpoint vocab."""
    ensure_dataset(dataset)

    def _map(raw):
        out = []
        for g in raw:
            out.append([(e2i[s], r2i[p], e2i[o]) for (s, p, o) in g
                        if s in e2i and p in r2i and o in e2i])
        return out

    train_f, val_f, test_f = get_file_paths(dataset)
    tr, va, te = parse_files_to_subgraphs(train_f, val_f, test_f, split_tab=True)
    return _map(tr), _map(va), _map(te)


# ---------------------------------------------------------------------------
# Quantitative latent probes
# ---------------------------------------------------------------------------

def random_steps_latent(dec: LatentDecoder, i2e, i2r, n_directions=20,
                        epsilon=1.2, rng=None):
    """Reference random_steps_latent_autoreg (interp:159-208)."""
    rng = rng or np.random.default_rng(0)
    d = dec.model.config["d_latent"]
    z0 = rng.standard_normal(d).astype(np.float32)
    dirs = rng.standard_normal((n_directions, d)).astype(np.float32)
    dirs /= np.maximum(np.linalg.norm(dirs, axis=1, keepdims=True), 1e-12)
    perturbed = z0[None] + epsilon * dirs
    # one dispatch: [z0; perturbed]
    all_decoded = ints_to_labels(
        dec.decode(np.concatenate([z0[None], perturbed]), beam=3), i2e, i2r)
    ref, decoded = all_decoded[0], all_decoded[1:]
    print("\n=== Local Latent Neighborhood Exploration ===")
    print("\n--- Reference Graph (z0) ---")
    for h, r, t in ref:
        print(f"({h}, {r}, {t})")
    for i, graph in enumerate(decoded):
        print(f"\n--- Perturbed z #{i + 1} ---")
        for h, r, t in graph:
            print(f"({h}, {r}, {t})")
        overlap = set(ref) & set(graph)
        print(f"# Overlapping triples with z0: {len(overlap)} / {max(1, len(ref))}")


def smoothness_line_check(dec: LatentDecoder, i2e, i2r, steps=10, epsilon=0.1,
                          beam=3, rng=None):
    """Reference smoothness_line_check_autoreg (interp:211-289)."""
    rng = rng or np.random.default_rng(0)
    d = dec.model.config["d_latent"]
    z0 = rng.standard_normal(d).astype(np.float32)
    direction = rng.standard_normal(d).astype(np.float32)
    direction /= max(np.linalg.norm(direction), 1e-12)
    print("\n=== Latent Smoothness Line Walk ===")
    print(f"Steps: {steps} | step size eps = {epsilon}")
    zs = np.stack([z0 + (s * epsilon) * direction for s in range(1, steps + 1)])
    # one dispatch: [anchor; walk]
    decoded = ints_to_labels(
        dec.decode(np.concatenate([z0[None], zs]), beam=beam), i2e, i2r)
    anchor, walk = decoded[0], decoded[1:]
    prev, total_local, total_global = anchor, 0.0, 0.0
    for graph in walk:
        local = len(set(prev) & set(graph)) / max(1, len(prev))
        glob = len(set(anchor) & set(graph)) / max(1, len(anchor))
        total_local += local
        total_global += glob
        prev = graph
    print(f"Avg local smoothness over {steps} steps: {total_local / steps:.2f}")
    print(f"Avg global overlap over {steps} steps : {total_global / steps:.2f}")
    return total_local / steps, total_global / steps


def _walk_grid(d, steps, epsilon, n_anchors, n_dirs, rng):
    """All anchors + all (anchor, dir) walks as ONE latent batch: the whole
    probe decodes in a single device dispatch (the reference decodes per-z
    at batch 1, interp:45-78; the ~30 ms/dispatch tunnel latency makes
    per-walk dispatch the next wall after per-z was removed).

    Returns (all_z [n_anchors + n_anchors*n_dirs*steps, d], draw order
    matching the per-anchor/per-dir loop of the reference)."""
    anchors, walks = [], []
    for _ in range(n_anchors):
        z0 = rng.standard_normal(d).astype(np.float32)
        anchors.append(z0)
        for _ in range(n_dirs):
            direction = rng.standard_normal(d).astype(np.float32)
            direction /= max(np.linalg.norm(direction), 1e-12)
            walks.append(np.stack([z0 + (s * epsilon) * direction
                                   for s in range(1, steps + 1)]))
    return np.concatenate([np.stack(anchors)] + walks, axis=0)


def latent_smoothness_score(dec: LatentDecoder, steps=10, epsilon=0.1,
                            n_anchors=3, n_dirs=3, beam=3, rng=None):
    """Reference latent_smoothness_score_autoreg (interp:293-352)."""
    rng = rng or np.random.default_rng(0)
    d = dec.model.config["d_latent"]
    all_z = _walk_grid(d, steps, epsilon, n_anchors, n_dirs, rng)
    sets = dec.decode_sets(all_z, beam=beam)
    tot_l = tot_g = cnt = 0.0
    idx = n_anchors
    for a in range(n_anchors):
        anchor = sets[a]
        for _ in range(n_dirs):
            walk = sets[idx:idx + steps]
            idx += steps
            prev = anchor
            for cur in walk:
                tot_l += jaccard(cur, prev)
                tot_g += jaccard(cur, anchor)
                cnt += 1
                prev = cur
    avg_l, avg_g = tot_l / max(1, cnt), tot_g / max(1, cnt)
    print(f"\n[SMOOTHNESS SCORE] anchors={n_anchors}, dirs={n_dirs}, "
          f"steps={steps}, eps={epsilon}")
    print(f"Avg local Jaccard : {avg_l:.3f}")
    print(f"Avg global Jaccard: {avg_g:.3f}")
    return avg_l, avg_g


def latent_flip_rate(dec: LatentDecoder, steps=30, epsilon=0.05, n_anchors=5,
                     n_dirs=4, beam=3, rng=None):
    """Reference latent_flip_rate_autoreg (interp:356-424)."""
    rng = rng or np.random.default_rng(0)
    d = dec.model.config["d_latent"]
    all_z = _walk_grid(d, steps, epsilon, n_anchors, n_dirs, rng)
    sets = dec.decode_sets(all_z, beam=beam)
    flips = total = 0
    basins = []
    idx = n_anchors
    for a in range(n_anchors):
        for _ in range(n_dirs):
            prev = sets[a]
            walk = sets[idx:idx + steps]
            idx += steps
            basin, last_flip = 1, False
            for cur in walk:
                flipped = int(cur != prev)
                flips += flipped
                total += 1
                if flipped:
                    basins.append(basin)
                    basin, last_flip = 1, True
                else:
                    basin += 1
                    last_flip = False
                prev = cur
            if not last_flip and basin > 0:
                basins.append(basin)
    flip_rate = flips / max(1, total)
    avg_basin = sum(basins) / max(1, len(basins))
    print(f"\n[FLIP RATE] anchors={n_anchors}, dirs={n_dirs}, steps={steps}, "
          f"eps={epsilon}")
    print(f"Flip rate      : {flip_rate:.3f}")
    print(f"Avg basin len  : {avg_basin:.2f} steps")
    return flip_rate, avg_basin


# ---------------------------------------------------------------------------
# wd-movies qualitative analysis (figures)
# ---------------------------------------------------------------------------

def _extract_genres(graph_labels):
    genres = []
    for _, r, t in graph_labels:
        if "has_genre" in (r or "").lower() or (r or "").lower() == "genre":
            g = (t or "").strip()
            if g and g not in genres:
                genres.append(g)
    return genres


def _tsne(x, seed=42):
    from sklearn.manifold import TSNE

    kwargs = dict(n_components=2,
                  perplexity=max(5, min(30, len(x) - 1)), random_state=seed)
    try:
        return TSNE(max_iter=1000, **kwargs).fit_transform(x)
    except TypeError:  # older sklearn spells it n_iter
        return TSNE(n_iter=1000, **kwargs).fit_transform(x)


def qualitative_latent_analysis_wd_movies(model, params, layout, vocabs,
                                          output_dir="figures", n_samples=500,
                                          use_all_test=False, rng=None):
    """Reference interp:428-894: encode test graphs -> mu, t-SNE colored by
    the 10 target genres, a genre-pair interpolation path, and a 5-point
    decoded-graph drawing sequence. Writes latent_tsne_movies.pdf,
    latent_tsne_movies_top10.pdf, latent_interpolation.pdf,
    interpolation_sequence.pdf."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib.gridspec import GridSpec
    import networkx as nx

    os.makedirs(output_dir, exist_ok=True)
    e2i, i2e = vocabs["e2i"], vocabs["i2e"]
    r2i, i2r = vocabs["r2i"], vocabs["i2r"]
    _, _, test_list = load_graphs_with_checkpoint_vocab("wd-movies", e2i, r2i)
    test_sample = test_list if use_all_test else test_list[:n_samples]
    rng = rng or jax.random.key(0)

    max_triples = layout.max_edges
    pad_row = (layout.pad_eid or 0, layout.pad_rid or 0, layout.pad_eid or 0)
    latents, primary, all_genres = [], [], []
    batch_triples, batch_meta = [], []
    for graph in test_sample:
        if not graph:
            continue
        arr = np.full((max_triples, 3), pad_row, np.int32)
        arr[:min(len(graph), max_triples)] = np.asarray(
            graph[:max_triples], np.int32)
        labels = ints_to_labels([graph], i2e, i2r, verbose=False)[0]
        genres = _extract_genres(labels)
        batch_triples.append(arr)
        batch_meta.append(genres)
    if not batch_triples:
        print("Warning: wd-movies test split is empty after vocab filtering.")
        return
    triples = jnp.asarray(np.stack(batch_triples))
    _, mu, _ = model.encode(params, triples, rng)
    mu = np.asarray(mu)
    lookup = {g.lower(): g for g in TARGET_GENRES}
    for i, genres in enumerate(batch_meta):
        latents.append(mu[i])
        all_genres.append(genres)
        canon = next((lookup[g.lower()] for g in genres if g.lower() in lookup),
                     None)
        primary.append(canon or "other")
    latents = np.stack(latents)

    emb2d = _tsne(latents)
    colors = ["#FF0000", "#FFD700", "#0000FF", "#000000", "#FF69B4",
              "#FF8C00", "#00FF00", "#8B4513", "#9370DB", "#00CED1"]
    genre_colors = dict(zip(TARGET_GENRES, colors))
    genre_colors["other"] = "#C0C0C0"

    for fname, include_other in [("latent_tsne_movies.pdf", True),
                                 ("latent_tsne_movies_top10.pdf", False)]:
        fig, ax = plt.subplots(figsize=(10, 10))
        for g in TARGET_GENRES + (["other"] if include_other else []):
            mask = np.array([p == g for p in primary])
            if mask.any():
                pts = emb2d[mask]
                ax.scatter(pts[:, 0], pts[:, 1], c=genre_colors[g], s=30,
                           alpha=0.7 if g != "other" else 0.3, label=g)
        ax.set_xlabel("t-SNE Component 1")
        ax.set_ylabel("t-SNE Component 2")
        ax.legend(loc="upper right", fontsize=8)
        plt.tight_layout()
        plt.savefig(os.path.join(output_dir, fname), dpi=150,
                    bbox_inches="tight")
        plt.close()

    # genre-pair interpolation (reference interp:784-833)
    pair = None
    for i, gi in enumerate(all_genres):
        ti = [g for g in gi if g in TARGET_GENRES]
        if not ti:
            continue
        for j in range(i + 1, len(all_genres)):
            tj = [g for g in all_genres[j] if g in TARGET_GENRES]
            if tj and set(ti).isdisjoint(tj):
                pair = (i, j, ti[0], tj[0])
                break
        if pair:
            break
    if pair is None:
        print("Skipping interpolation path: no suitable genre pair found.")
        return
    i, j, g1, g2 = pair
    print(f"Interpolating between {g1} and {g2}")
    z1, z2 = latents[i], latents[j]
    alphas = np.linspace(0, 1, 20)
    path = np.stack([(1 - a) * z1 + a * z2 for a in alphas])
    joint = _tsne(np.vstack([latents, path]))
    path2d = joint[len(latents):]
    fig, ax = plt.subplots(figsize=(10, 10))
    ax.scatter(joint[:len(latents), 0], joint[:len(latents), 1],
               c="lightgray", alpha=0.3, s=10)
    ax.plot(path2d[:, 0], path2d[:, 1], "b-", lw=2, alpha=0.7,
            label="Interpolation path")
    ax.scatter(*path2d[0], c="red", s=150, marker="s", label=f"Start: {g1}")
    ax.scatter(*path2d[-1], c="blue", s=150, marker="s", label=f"End: {g2}")
    ax.legend(fontsize=8)
    plt.tight_layout()
    plt.savefig(os.path.join(output_dir, "latent_interpolation.pdf"), dpi=150,
                bbox_inches="tight")
    plt.close()

    # 5-point decoded-graph drawings (reference interp:835-875)
    dec = LatentDecoder(model, params, layout)
    beam_width = model.config.get("beam_width", 3)
    fig3 = plt.figure(figsize=(18, 4))
    gs = GridSpec(1, 5, figure=fig3, wspace=0.3)
    alphas = [0.0, 0.25, 0.5, 0.75, 1.0]
    za_all = np.stack([(1 - a) * z1 + a * z2 for a in alphas])
    decoded_sets = dec.decode_sets(za_all, beam=beam_width)  # one dispatch
    for idx, a in enumerate(alphas):
        ax = fig3.add_subplot(gs[0, idx])
        decoded = sorted(decoded_sets[idx])
        labels = ints_to_labels([decoded], i2e, i2r, verbose=False)[0]
        G = nx.DiGraph()
        for h, r, t in labels[:6]:
            G.add_edge(h[:15], t[:15], label=r[:10])
        if len(G):
            pos = nx.spring_layout(G, seed=42, k=2, iterations=50)
            nx.draw_networkx_nodes(G, pos, node_color="lightblue",
                                   node_size=600, ax=ax)
            nx.draw_networkx_labels(G, pos, font_size=7, ax=ax)
            nx.draw_networkx_edges(G, pos, edge_color="gray", arrows=True,
                                   arrowsize=10, ax=ax, width=1.5)
            nx.draw_networkx_edge_labels(
                G, pos, nx.get_edge_attributes(G, "label"), font_size=6, ax=ax)
        ax.axis("off")
        genres = _extract_genres(labels)
        ax.text(0.5, -0.15, f"Genres: {', '.join(genres[:3]) or 'unknown'}",
                transform=ax.transAxes, ha="center", fontsize=8, style="italic")
    plt.tight_layout()
    plt.savefig(os.path.join(output_dir, "interpolation_sequence.pdf"),
                dpi=150, bbox_inches="tight")
    plt.close()
    print(f"\nQualitative analysis complete. Figures saved to {output_dir}/")


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str, required=True)
    parser.add_argument("--checkpoint-dir", type=str, default="checkpoints")
    parser.add_argument("--wandb-project", type=str, default="submission")
    parser.add_argument("--wandb-entity", type=str, default=None)
    parser.add_argument("--directions", type=int, default=20)
    parser.add_argument("--epsilon", type=float, default=0.1)
    parser.add_argument("--epoch", type=int, default=None)
    args = parser.parse_args(argv)
    # one TPU job at a time (no-op on the cpu platform)
    from ark_tpu.utils.device_lock import acquire_device_lock
    acquire_device_lock(tag="interpolation")

    import yaml

    with open(args.config) as f:
        config = yaml.safe_load(f)
    dataset = config["dataset"]
    model_type = config.get("model_type", "SAIL")
    beam = config.get("beam_width", 3)

    model, params, config, ckpt_path, vocabs, _, layout = load_model(
        args.checkpoint_dir, dataset, model_type, epoch=args.epoch)
    if vocabs is None:
        raise KeyError("Checkpoint missing 'vocabs'; retrain and save with "
                       "vocabulary mappings.")
    i2e, i2r = vocabs["i2e"], vocabs["i2r"]

    run = Run(project=args.wandb_project, entity=args.wandb_entity,
              config=config,
              name=f"latent_interp_{dataset}_{model_type}")
    kind = f"epoch {args.epoch}" if args.epoch is not None else "best"
    print(f"Loaded {model_type} for {dataset} ({kind}) from {ckpt_path}")

    if dataset == "wd-movies":
        qualitative_latent_analysis_wd_movies(
            model, params, layout, vocabs, output_dir="figures",
            n_samples=10000, use_all_test=True)

    dec = LatentDecoder(model, params, layout)
    if model_type in ("SAIL", "t-SAIL"):
        for e in [0.02, 0.05, 0.07, 0.1, 0.12, 0.15, 0.17, 0.2]:
            print("-" * 70)
            print("epsilon value is:", e)
            print("-" * 70)
            random_steps_latent(dec, i2e, i2r, n_directions=args.directions,
                                epsilon=e)
            smoothness_line_check(dec, i2e, i2r, steps=10, epsilon=e, beam=beam)
            latent_smoothness_score(dec, steps=10, epsilon=e, n_anchors=3,
                                    n_dirs=3, beam=beam)
            latent_flip_rate(dec, steps=30, epsilon=e, n_anchors=5, n_dirs=4,
                             beam=beam)
    run.finish()


if __name__ == "__main__":
    main()
