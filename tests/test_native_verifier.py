"""Native (C++) host-eval engine vs the pure-Python verifiers/evaluator:
exact agreement on validity, novelty, and the percentage surface.
"""

import numpy as np
import pytest

from ark_tpu.data import DATASET_NAMES, load_data_as_list
from ark_tpu.eval import SemanticEvaluator, get_verifier, post_process_data
from ark_tpu.native import (
    NativeSemanticEvaluator,
    graph_hashes_native,
    native_available,
    verify_graphs_native,
)

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="no C++ toolchain")


def _corrupt(graphs, rng, n_entities, n_relations):
    """Mix of intact, shuffled, truncated, duplicated and OOV-mangled graphs
    — the kinds of outputs a sampler produces."""
    out = []
    for i, g in enumerate(graphs):
        g = [tuple(t) for t in g]
        k = i % 6
        if k == 0:
            out.append(g)
        elif k == 1:
            out.append(list(reversed(g)))
        elif k == 2:
            out.append(g[:-1])                     # truncated
        elif k == 3:
            out.append(g + [g[0]])                 # duplicate triple
        elif k == 4:
            h, r, t = g[0]
            out.append([(h, r, n_entities + 5)] + g[1:])  # OOV tail
        else:
            h, r, t = g[0]
            out.append([(t, r, h)] + g[1:])        # reversed edge
    return out


@pytest.mark.parametrize("name", DATASET_NAMES)
def test_native_matches_python(small_datasets, name):
    train_g, val_g, *_rest = load_data_as_list(name)[:2], None
    train_g, val_g, test_g, (e2i, i2e), (r2i, i2r), _, _ = load_data_as_list(name)
    rng = np.random.default_rng(0)
    predicted = _corrupt(val_g[:120], rng, len(e2i), len(r2i))

    # --- validity: native flags == python verifier per graph
    native_valid = verify_graphs_native(name, predicted, e2i, r2i)
    verifier = get_verifier(name)
    from ark_tpu.data.tokenizer import ints_to_labels
    labels = ints_to_labels(predicted, i2e, i2r, verbose=False)
    for i, (flag, lab) in enumerate(zip(native_valid, labels)):
        want = bool(lab) and verifier.check_rules_for_graph(lab)
        assert bool(flag) == want, (name, i, lab)

    # --- full evaluator surface
    gt_labels = post_process_data(train_g, i2e, i2r)
    py = SemanticEvaluator(labels, gt_labels,
                           rule_checker=verifier.check_rules_for_graph)
    nat = NativeSemanticEvaluator(name, predicted, train_g, e2i, r2i)
    for key in ("semantics", "novel", "novel_semantics", "empty"):
        assert (py.organized_results["results"][key]
                == pytest.approx(nat.organized_results["results"][key])), key


def test_hash_canonicalization(small_datasets):
    train_g, *_ = load_data_as_list("syn-paths")
    g = [tuple(t) for t in train_g[0]]
    h1, e1 = graph_hashes_native([g], 49, 3)
    h2, e2 = graph_hashes_native([list(reversed(g))], 49, 3)
    h3, _ = graph_hashes_native([g + [g[0]]], 49, 3)  # dup collapses
    assert h1[0] == h2[0] == h3[0]
    assert e1[0] == 0
    h4, e4 = graph_hashes_native([[]], 49, 3)
    assert e4[0] == 1


@pytest.mark.parametrize("name", DATASET_NAMES)
def test_native_matches_python_on_random_garbage(small_datasets, name):
    """Fuzz: pure random token soup (including OOV ids and empty graphs)
    must produce identical validity flags in both implementations."""
    train_g, val_g, test_g, (e2i, i2e), (r2i, i2r), _, _ = load_data_as_list(name)
    rng = np.random.default_rng(42)
    graphs = []
    for _ in range(150):
        m = int(rng.integers(0, 8))
        g = [(int(rng.integers(-2, len(e2i) + 3)),
              int(rng.integers(-1, len(r2i) + 2)),
              int(rng.integers(-2, len(e2i) + 3))) for _ in range(m)]
        graphs.append(g)
    native = verify_graphs_native(name, graphs, e2i, r2i)
    verifier = get_verifier(name)
    from ark_tpu.data.tokenizer import ints_to_labels
    labels = ints_to_labels(graphs, i2e, i2r, verbose=False)
    for i, (flag, lab) in enumerate(zip(native, labels)):
        want = bool(lab) and verifier.check_rules_for_graph(lab)
        assert bool(flag) == want, (name, i, graphs[i], lab)
