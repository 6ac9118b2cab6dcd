"""Data layer tests: loader contract, tokenization round-trip, array encoding.

Mirrors the reference semantics in kgvae/model/utils.py:66-146 and
kgvae/experiments/train.py:328-408 (SURVEY.md §4 test plan).
"""

import numpy as np
import pytest

from ark_tpu.data import (
    DATASET_NAMES,
    SPECIAL_TOKENS,
    batch_iterator,
    build_vocab_layout,
    canonical_graph_string,
    encode_graphs,
    load_data_as_list,
    seq_to_triples,
    triples_to_seq,
)
from ark_tpu.data.dataset import num_batches


def _layout_for(name):
    train_g, val_g, test_g, (e2i, i2e), (r2i, i2r), (mn, mx), _ = load_data_as_list(name)
    use_padding = name.startswith("wd-")
    layout = build_vocab_layout(len(e2i), len(r2i), mn, mx, use_padding)
    return train_g, val_g, test_g, e2i, i2e, r2i, i2r, layout


@pytest.mark.parametrize("name", DATASET_NAMES)
def test_load_data_contract(small_datasets, name):
    train_g, val_g, test_g, (e2i, i2e), (r2i, i2r), (mn, mx), labels = load_data_as_list(name)
    assert len(train_g) > 0 and len(val_g) > 0 and len(test_g) > 0
    assert 0 < mn <= mx
    # int triples indexable through the vocab maps
    h, r, t = train_g[0][0]
    assert i2e[h] in e2i and i2r[r] in r2i and i2e[t] in e2i
    if not name.startswith("wd-"):
        assert mn == mx, "non-padded datasets must have constant edge count"


def test_vocab_layout_semantics(small_datasets):
    # non-padded: no pad ids (reference train.py:332-348)
    *_, layout = _layout_for("syn-paths")
    assert layout.pad_eid is None and layout.pad_rid is None
    assert layout.ent_base == 3
    assert layout.rel_base == 3 + layout.num_entities
    assert layout.vocab_size == layout.rel_base + layout.num_relations
    assert layout.seq_len == 2 + 3 * layout.max_edges
    assert layout.num_entities == 49 and layout.num_relations == 3

    # padded: pad ids appended, counts grown by one (train.py:334-338)
    train_g, *_ , layout_wd = _layout_for("wd-movies")
    assert layout_wd.pad_eid == layout_wd.num_entities - 1
    assert layout_wd.pad_rid == layout_wd.num_relations - 1


def test_tokenize_roundtrip(small_datasets):
    train_g, *_, layout = _layout_for("syn-paths")
    for g in train_g[:50]:
        seq = triples_to_seq(g, SPECIAL_TOKENS, layout.ent_base, layout.rel_base, layout.seq_len)
        assert len(seq) == layout.seq_len
        assert seq[0] == SPECIAL_TOKENS["BOS"]
        back = seq_to_triples(seq, SPECIAL_TOKENS, layout.ent_base, layout.rel_base)
        assert back == [tuple(t) for t in g]


def test_encode_graphs_matches_scalar_tokenizer(small_datasets):
    for name in ["syn-tipr", "wd-articles"]:
        train_g, *_ , layout = _layout_for(name)
        data = encode_graphs(train_g[:64], layout)
        for i, g in enumerate(train_g[:64]):
            ref = triples_to_seq(g, SPECIAL_TOKENS, layout.ent_base,
                                 layout.rel_base, layout.seq_len)
            np.testing.assert_array_equal(data.seq[i], np.asarray(ref, np.int32))
            assert data.n_edges[i] == len(g)
            if layout.use_padding:
                pad_rows = data.triples[i, len(g):]
                if pad_rows.size:
                    assert (pad_rows[:, 1] == layout.pad_rid).all()
                    assert (pad_rows[:, 0] == layout.pad_eid).all()


def test_batch_iterator_shapes_and_permutation(small_datasets):
    train_g, *_ , layout = _layout_for("syn-paths")
    data = encode_graphs(train_g[:100], layout, permute=True)
    rng = np.random.default_rng(0)
    batches = list(batch_iterator(data, 32, shuffle=True, drop_last=True, rng=rng))
    assert len(batches) == num_batches(100, 32, drop_last=True) == 3
    for triples, seq in batches:
        assert triples.shape == (32, layout.max_edges, 3)
        assert seq.shape == (32, layout.seq_len)
        # permuted seq must still decode to the same triple multiset
        for i in range(4):
            back = seq_to_triples(seq[i], SPECIAL_TOKENS, layout.ent_base, layout.rel_base)
            assert sorted(back) == sorted(map(tuple, triples[i].tolist()))

    # padded dataset: permute flag is inert (SURVEY quirk Q-5)
    train_wd, *_ , layout_wd = _layout_for("wd-movies")
    data_wd = encode_graphs(train_wd[:40], layout_wd, permute=True)
    b0 = next(batch_iterator(data_wd, 8, rng=np.random.default_rng(1)))
    np.testing.assert_array_equal(b0[1], data_wd.seq[:8])


def test_canonical_graph_string():
    g1 = [(3, 1, 2), (0, 0, 1)]
    g2 = [(0, 0, 1), (3, 1, 2)]
    assert canonical_graph_string(g1) == canonical_graph_string(g2)


def test_deterministic_generation(small_datasets):
    # regeneration from the same seed must be byte-identical
    from ark_tpu.data.generators import generate_splits
    a = generate_splits("syn-paths", sizes=(50, 10, 10))
    b = generate_splits("syn-paths", sizes=(50, 10, 10))
    assert a == b


def test_external_data_adopted_not_overwritten(tmp_path, monkeypatch):
    """Bring-your-own data: real IntelliGraphs tsv files dropped into the
    data dir must be ADOPTED (checksummed into meta.json), never silently
    replaced by generated surrogates (loader.py::download_dataset)."""
    from ark_tpu.data import loader

    monkeypatch.setenv("ARK_TPU_DATA_DIR", str(tmp_path))
    d = tmp_path / "syn-paths"
    d.mkdir()
    graphs = {
        "train": [[("amsterdam", "drive_to", "utrecht"),
                   ("utrecht", "cycle_to", "gouda")],
                  [("gouda", "train_to", "delft")]],
        "valid": [[("delft", "drive_to", "leiden")]],
        "test": [[("leiden", "cycle_to", "haarlem")]],
    }
    for split, gs in graphs.items():
        # graphs separated by blank lines (IntelliGraphs tsv layout)
        (d / f"{split}.tsv").write_text(
            "\n\n".join("\n".join("\t".join(t) for t in g) for g in gs)
            + "\n")
    before = {s: (d / f"{s}.tsv").read_bytes() for s in graphs}

    train_g, val_g, test_g, (e2i, _), (r2i, _), (mn, mx), _ = (
        loader.load_data_as_list("syn-paths"))
    # files untouched, meta marks external, integrity check passes
    after = {s: (d / f"{s}.tsv").read_bytes() for s in graphs}
    assert after == before
    import json as _json
    meta = _json.loads((d / "meta.json").read_text())
    assert meta["source"] == "external"
    assert meta["splits"] == {"train": 2, "valid": 1, "test": 1}
    assert loader.DatasetDownloader(names=["syn-paths"]).verify_datasets()
    # the returned graphs are the user's, not surrogates
    assert len(train_g) == 2 and len(val_g) == 1 and len(test_g) == 1
    assert (mn, mx) == (1, 2)
    assert set(r2i) == {"drive_to", "cycle_to", "train_to"}
    assert set(e2i) == {"amsterdam", "utrecht", "gouda", "delft",
                        "leiden", "haarlem"}
    # second load is stable (no regeneration)
    again = loader.load_data_as_list("syn-paths")
    assert again[0] == train_g


def test_partial_external_data_refused_not_overwritten(tmp_path, monkeypatch):
    """A PARTIAL bring-your-own copy (only some split files present, no
    meta.json) must refuse to generate, not open the user's file with
    mode 'w' and replace it with surrogates (round-4 review finding);
    same for adopted external data with a split file later deleted."""
    from ark_tpu.data import loader

    monkeypatch.setenv("ARK_TPU_DATA_DIR", str(tmp_path))
    d = tmp_path / "syn-paths"
    d.mkdir()
    body = "amsterdam\tdrive_to\tutrecht\n"
    (d / "train.tsv").write_text(body)
    with pytest.raises(FileExistsError, match="Refusing to generate"):
        loader.ensure_dataset("syn-paths")
    assert (d / "train.tsv").read_text() == body  # untouched

    # complete the copy -> adopted; then delete one split: regeneration
    # must refuse (remaining files are real user data)
    (d / "valid.tsv").write_text(body)
    (d / "test.tsv").write_text(body)
    loader.ensure_dataset("syn-paths")
    import json as _json
    assert _json.loads((d / "meta.json").read_text())["source"] == "external"
    (d / "valid.tsv").unlink()
    with pytest.raises(FileExistsError, match="external data is missing"):
        loader.ensure_dataset("syn-paths")
    assert (d / "train.tsv").read_text() == body


def test_external_data_malformed_rejected(tmp_path, monkeypatch):
    from ark_tpu.data import loader

    monkeypatch.setenv("ARK_TPU_DATA_DIR", str(tmp_path))
    d = tmp_path / "syn-paths"
    d.mkdir()
    (d / "train.tsv").write_text("a\tdrive_to\tb\n\nnot a triple\n")
    (d / "valid.tsv").write_text("a\tdrive_to\tb\n")
    (d / "test.tsv").write_text("a\tdrive_to\tb\n")
    import pytest as _pytest
    with _pytest.raises(ValueError, match="Malformed triple line"):
        loader.ensure_dataset("syn-paths")
