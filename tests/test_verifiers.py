"""Verifier acceptance tests (SURVEY.md §7 step 5): 100% of generated
train/val/test graphs must verify as valid; known-corrupted graphs must not.
"""

import pytest

from ark_tpu.data import DATASET_NAMES
from ark_tpu.data.loader import get_file_paths, parse_files_to_subgraphs
from ark_tpu.eval import SemanticEvaluator, get_verifier, post_process_data
from ark_tpu.data import load_data_as_list


@pytest.mark.parametrize("name", DATASET_NAMES)
def test_all_generated_graphs_valid(small_datasets, name):
    verifier = get_verifier(name)
    splits = parse_files_to_subgraphs(*get_file_paths(name))
    for split in splits:
        for g in split:
            violations = verifier.evaluate_graph(g)
            assert violations == [], f"{name}: {violations} for {g}"


def test_known_invalid_graphs(small_datasets):
    v = get_verifier("syn-paths")
    assert v.evaluate_graph([]) != []
    # branching: two edges out of Amsterdam
    bad = [("Amsterdam", "drive_to", "Utrecht"),
           ("Amsterdam", "drive_to", "Breda"),
           ("Utrecht", "train_to", "Delft")]
    assert not v.check_rules_for_graph(bad)
    # disconnected
    bad2 = [("Amsterdam", "drive_to", "Utrecht"),
            ("Breda", "drive_to", "Delft"),
            ("Gouda", "train_to", "Assen")]
    assert not v.check_rules_for_graph(bad2)
    # valid path
    good = [("Amsterdam", "drive_to", "Utrecht"),
            ("Utrecht", "cycle_to", "Breda"),
            ("Breda", "train_to", "Delft")]
    assert v.check_rules_for_graph(good)
    # order-independence
    assert v.check_rules_for_graph(list(reversed(good)))

    t = get_verifier("syn-types")
    assert not t.check_rules_for_graph([("Ada", "lives_in", "UvA")] * 1)
    tp = get_verifier("syn-tipr")
    bad_tipr = [("Alan Turing", "has_role", "_:role"),
                ("_:role", "has_name", "phd student"),
                ("_:role", "has_time", "_:time"),
                ("_:time", "has_start", "2000"),
                ("_:time", "has_end", "1990")]
    assert not tp.check_rules_for_graph(bad_tipr)  # start after end
    m = get_verifier("wd-movies")
    assert not m.check_rules_for_graph([("_:movie", "has_genre", "Drama film")])  # no director/cast
    a = get_verifier("wd-articles")
    assert not a.check_rules_for_graph([("_:article", "has_author", "author_00001")])  # no venue


def test_semantic_evaluator_percentages(small_datasets):
    name = "syn-paths"
    train_g, val_g, test_g, (e2i, i2e), (r2i, i2r), _, _ = load_data_as_list(name)
    verifier = get_verifier(name)
    gt = post_process_data(train_g, i2e, i2r)

    # predicted = 2 train graphs (valid, not novel) + 1 invalid graph + 1 empty
    invalid = [("Amsterdam", "drive_to", "Amsterdam"),
               ("Amsterdam", "drive_to", "Breda"),
               ("Breda", "drive_to", "Gouda")]
    predicted = [gt[0], gt[1], invalid, []]
    ev = SemanticEvaluator(predicted, gt, rule_checker=verifier.check_rules_for_graph)
    res = ev.organized_results["results"]
    assert res["semantics"] == 50.0
    assert res["novel"] == 50.0           # invalid + empty are not in train set
    assert res["novel_semantics"] == 0.0
    assert res["empty"] == 25.0


def test_crosscheck_harness_self_check(small_datasets):
    """The verifier ground-truth cross-check harness
    (scripts/crosscheck_verifiers.py, round-3 VERDICT item 5): on the
    surrogate data it must report 100% validity and zero python<->native
    disagreements; the package leg is skipped here (not importable)."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "crosscheck_verifiers",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "scripts",
            "crosscheck_verifiers.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    n, n_inv, n_nat, n_pkg, pkg = mod.crosscheck("syn-paths", "valid",
                                                 limit=300)
    assert n > 0 and n_inv == 0 and n_nat == 0 and n_pkg == 0
    assert not pkg  # the external package is absent in this environment
