"""Semantic evaluation: validity / novelty percentages over sampled graphs.

Re-implements the contract the reference consumes from
``intelligraphs.evaluators`` (reference kgvae/model/verification.py:4,
124-137):

  - ``post_process_data(graphs_int, i2e, i2r)`` -> label-level graphs
  - ``SemanticEvaluator(predicted, ground_truth, rule_checker,
    entity_labels, relation_labels)`` exposing
    ``organized_results["results"]`` with percentage keys
    ``"semantics"`` (% rule-valid), ``"novel"`` (% not present in the
    ground-truth/train set) and ``"novel_semantics"`` (% both), plus
    ``print_results()``.

Consumed at reference train.py:541-548 (divided by 100 into
``verification/*_rate`` metrics).
"""

from __future__ import annotations

from ark_tpu.data.tokenizer import ints_to_labels


def post_process_data(graphs_int, i2e, i2r):
    """Int-triple graphs -> label graphs (ground-truth side)."""
    return ints_to_labels(graphs_int, i2e, i2r, verbose=False)


def _canonical(graph) -> frozenset:
    return frozenset(tuple(t) for t in graph)


class SemanticEvaluator:
    def __init__(self, predicted_graphs, ground_truth_graphs, rule_checker,
                 entity_labels=None, relation_labels=None):
        self.predicted_graphs = predicted_graphs
        self.ground_truth_graphs = ground_truth_graphs
        self.rule_checker = rule_checker
        self.entity_labels = entity_labels
        self.relation_labels = relation_labels
        self.organized_results = None
        self.evaluate_graphs()

    def evaluate_graphs(self):
        train_set = {_canonical(g) for g in self.ground_truth_graphs}
        n = len(self.predicted_graphs)
        n_valid = n_novel = n_valid_novel = n_empty = 0
        for g in self.predicted_graphs:
            valid = bool(g) and bool(self.rule_checker(g))
            # NOTE: an EMPTY graph counts as novel (the empty frozenset is
            # never in the train set), so novel_rate reads 100% for a
            # degenerate EOS-only sampler — read it alongside the reported
            # empty%. Whether the original intelligraphs evaluator excludes
            # empties is unverifiable in this environment (see
            # scripts/crosscheck_verifiers.py); headline selection uses
            # valid&novel, where empties can never score (valid is False).
            novel = _canonical(g) not in train_set
            if not g:
                n_empty += 1
            if valid:
                n_valid += 1
            if novel:
                n_novel += 1
            if valid and novel:
                n_valid_novel += 1
        pct = (lambda c: 100.0 * c / n if n else 0.0)
        self.organized_results = {
            "results": {
                "semantics": pct(n_valid),
                "novel": pct(n_novel),
                "novel_semantics": pct(n_valid_novel),
                "empty": pct(n_empty),
            },
            "counts": {
                "total": n,
                "valid": n_valid,
                "novel": n_novel,
                "valid_novel": n_valid_novel,
                "empty": n_empty,
            },
        }
        return self.organized_results

    def print_results(self):
        r = self.organized_results["results"]
        c = self.organized_results["counts"]
        print(f"  graphs evaluated : {c['total']}")
        print(f"  valid (semantics): {r['semantics']:.2f}%")
        print(f"  novel            : {r['novel']:.2f}%")
        print(f"  valid & novel    : {r['novel_semantics']:.2f}%")
        print(f"  empty graphs     : {r['empty']:.2f}%")


def run_semantic_evaluation(predicted_graphs_lbl, train_g, i2e, i2r, verifier, title):
    """Reference glue (verification.py:124-137): evaluate predicted label
    graphs against the train split, print, return the evaluator."""
    gt_graphs_lbl = post_process_data(train_g, i2e, i2r)
    evaluator = SemanticEvaluator(
        predicted_graphs_lbl,
        gt_graphs_lbl,
        rule_checker=verifier.check_rules_for_graph,
        entity_labels=i2e,
        relation_labels=i2r,
    )
    print(f"\nSemantic evaluation – {title}:")
    evaluator.print_results()
    return evaluator
