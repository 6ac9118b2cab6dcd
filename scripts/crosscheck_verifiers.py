#!/usr/bin/env python
"""Cross-check the re-derived verifier rules against ground truth.

The rules in ark_tpu/eval/verifiers.py re-implement the contract the
reference consumes from the external ``intelligraphs`` package
(reference kgvae/model/verification.py:2-16, pyproject.toml:16). That
package is unavailable in the build environment, so the rules were
re-derived from the dataset schemas — this harness is the runnable
validation for when ground truth IS available (round-3 VERDICT item 5):

  1. self-check (always runs): the pure-Python verifiers and the native
     C++ engine must agree graph-by-graph on every dataset split, and
     100% of dataset graphs must be valid (the acceptance bar the
     original datasets satisfy by construction).
  2. package cross-check (runs when ``intelligraphs`` is importable,
     e.g. outside this environment after ``pip install intelligraphs``):
     per-graph verdicts from ``intelligraphs.verifier.synthetic.*`` /
     ``.wikidata.*`` are compared against the repo verifiers; any
     disagreement is printed with both sides' violation lists.

Point ARK_TPU_DATA_DIR at real IntelliGraphs tsv exports first (the
bring-your-own-data path, docs/DATASETS.md "Using the real IntelliGraphs
data") to validate against the real splits rather than the procedural
surrogate:

    ARK_TPU_DATA_DIR=/path/to/real python scripts/crosscheck_verifiers.py
    python scripts/crosscheck_verifiers.py --dataset wd-movies --split test

Exit status: 0 = full agreement, 1 = any disagreement or validity < 100%.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DATASETS = ["syn-paths", "syn-types", "syn-tipr", "wd-movies", "wd-articles"]

# repo class name -> intelligraphs module path (reference verification.py:2-3)
PACKAGE_VERIFIERS = {
    "syn-paths": ("intelligraphs.verifier.synthetic", "SynPathsVerifier"),
    "syn-types": ("intelligraphs.verifier.synthetic", "SynTypesVerifier"),
    "syn-tipr": ("intelligraphs.verifier.synthetic", "SynTIPRVerifier"),
    "wd-movies": ("intelligraphs.verifier.wikidata", "WDMoviesVerifier"),
    "wd-articles": ("intelligraphs.verifier.wikidata", "WDArticlesVerifier"),
}


def _load_package_verifier(name):
    """The ground-truth verifier, or None when the package is absent."""
    mod_name, cls = PACKAGE_VERIFIERS[name]
    try:
        import importlib

        mod = importlib.import_module(mod_name)
    except ImportError:
        return None
    return getattr(mod, cls)()


def _labeled_graphs(name, split):
    from ark_tpu.data.loader import load_data_as_list

    train_g, val_g, test_g, (e2i, i2e), (r2i, i2r), _, _ = \
        load_data_as_list(name)
    idx = {"train": train_g, "valid": val_g, "test": test_g}[split]
    labeled = [[(i2e[h], i2r[r], i2e[t]) for (h, r, t) in g] for g in idx]
    return idx, labeled, e2i, r2i


def crosscheck(name, split, limit=0, max_print=10):
    """Returns (n_checked, n_invalid, n_native_disagree, n_pkg_disagree,
    pkg_available). n_native_disagree is None when the native engine is
    unavailable (no C++ toolchain) — a SKIPPED leg, distinct from
    agreement; a crashing engine is a real bug and propagates."""
    from ark_tpu.eval.verifiers import get_verifier

    idx_graphs, labeled, e2i, r2i = _labeled_graphs(name, split)
    if limit:
        idx_graphs, labeled = idx_graphs[:limit], labeled[:limit]
    repo = get_verifier(name)
    repo_ok = [repo.check_rules_for_graph(g) for g in labeled]
    n_invalid = repo_ok.count(False)

    # native C++ engine agreement — availability is checked EXPLICITLY
    # (engine._load returns None without a toolchain); any exception from
    # the engine itself is a genuine defect and must fail the harness
    from ark_tpu.native import engine as native_engine

    if native_engine._load() is None:
        n_native_dis = None
    else:
        n_native_dis = 0
        native_ok = native_engine.verify_graphs_native(name, idx_graphs,
                                                       e2i, r2i)
        shown = 0
        for i, (a, b) in enumerate(zip(repo_ok, native_ok)):
            if bool(a) != bool(b):
                n_native_dis += 1
                if shown < max_print:
                    print(f"  NATIVE DISAGREES [{name}/{split} #{i}]: "
                          f"python={a} native={bool(b)} "
                          f"violations={repo.evaluate_graph(labeled[i])}")
                    shown += 1

    # ground-truth package agreement (skipped when not importable)
    pkg = _load_package_verifier(name)
    n_pkg_dis = 0
    if pkg is not None:
        shown = 0
        for i, g in enumerate(labeled):
            want = bool(pkg.check_rules_for_graph(g))
            if want != repo_ok[i]:
                n_pkg_dis += 1
                if shown < max_print:
                    print(f"  PACKAGE DISAGREES [{name}/{split} #{i}]: "
                          f"repo={repo_ok[i]} package={want}")
                    print(f"    repo violations:    "
                          f"{repo.evaluate_graph(g)}")
                    print(f"    package violations: {pkg.evaluate_graph(g)}")
                    shown += 1
    return len(labeled), n_invalid, n_native_dis, n_pkg_dis, pkg is not None


def main(argv=None):
    ap = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter)
    ap.add_argument("--dataset", default="all", choices=DATASETS + ["all"])
    ap.add_argument("--split", default="all",
                    choices=["train", "valid", "test", "all"])
    ap.add_argument("--limit", type=int, default=0,
                    help="check at most N graphs per split (0 = all)")
    args = ap.parse_args(argv)

    names = DATASETS if args.dataset == "all" else [args.dataset]
    splits = (["train", "valid", "test"] if args.split == "all"
              else [args.split])
    failed = False
    any_pkg = False
    for name in names:
        for split in splits:
            n, n_inv, n_nat, n_pkg, pkg_ok = crosscheck(name, split,
                                                        args.limit)
            any_pkg |= pkg_ok
            status = "OK" if (n_inv == 0 and not n_nat and n_pkg == 0) \
                else "FAIL"
            failed |= status == "FAIL"
            print(f"[{status}] {name}/{split}: {n} graphs, "
                  f"{n - n_inv} valid ({100.0 * (n - n_inv) / max(n, 1):.2f}%), "
                  f"native disagreements: "
                  f"{'skipped (no C++ toolchain)' if n_nat is None else n_nat}, "
                  f"package disagreements: "
                  f"{n_pkg if pkg_ok else 'n/a (package not installed)'}")
    if not any_pkg:
        print("\nNOTE: the `intelligraphs` package is not importable here — "
              "only the python<->native self-check ran. Install it "
              "(pip install intelligraphs) and point ARK_TPU_DATA_DIR at the "
              "real tsv exports to validate against ground truth.")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
