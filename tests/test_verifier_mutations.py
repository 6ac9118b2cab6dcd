"""Verifier mutation matrix (round-3 VERDICT item 3).

For EVERY violation branch in every verifier (ark_tpu/eval/verifiers.py), a
known-invalid graph violating exactly that rule. The verifiers substitute
for the external intelligraphs ground-truth package (reference
verification.py:7-16), so their negative behavior needs per-branch
evidence, not just 100%-positive acceptance.

Each case asserts: the expected violation fires, check_rules_for_graph is
False, and — when every label exists in the dataset vocabulary — the native
C++ engine agrees the graph is invalid.

Branch coverage is checked explicitly: the matrix must exercise every
violation name in the verifier source (module-level inventory below), minus
branches proven unreachable (documented).
"""

import pytest

from ark_tpu.data import load_data_as_list, specs
from ark_tpu.eval import get_verifier

# every violation tag a verifier can emit, by dataset (enumerated from
# ark_tpu/eval/verifiers.py)
ALL_BRANCHES = {
    "syn-paths": {
        "empty_graph", "duplicate_triple", "unknown_relation",
        "entity_is_not_a_city", "self_loop", "graph_is_not_length_3",
        "nodes_not_distinct", "branching_path", "not_a_single_path",
        "disconnected_path",
    },
    "syn-types": {
        "empty_graph", "duplicate_triple", "unknown_relation",
        "subject_not_person", "subject_not_university", "object_not_city",
        "object_not_university", "graph_is_not_length_3",
    },
    "syn-tipr": {
        "empty_graph", "duplicate_triple", "unknown_relation",
        "missing_relation", "relation_not_unique", "subject_not_academic",
        "role_node_mismatch", "time_node_mismatch", "unknown_role_name",
        "unknown_year", "start_after_end",
    },
    "wd-movies": {
        "empty_graph", "duplicate_triple", "subject_not_movie_node",
        "director_not_person", "cast_not_person", "genre_unknown",
        "unknown_relation", "no_director", "no_cast",
    },
    "wd-articles": {
        "empty_graph", "duplicate_triple", "subject_not_article_node",
        "author_not_person", "cited_not_work", "subject_not_topic",
        "venue_unknown", "unknown_relation", "no_author",
        "venue_count_not_one",
    },
}

# With SYN_PATHS_EDGES=3, "not_a_single_path" (deg<=1 everywhere but not
# exactly one source+sink) cannot fire: two disjoint paths need >=5 distinct
# nodes (caught by nodes_not_distinct), cycles have in=out=1 on every node so
# they never change the source/sink count away from the path component's
# (caught by disconnected_path instead). Proven-unreachable, excluded.
UNREACHABLE = {"syn-paths": {"not_a_single_path"}}


def _tipr_valid():
    return [("Alan Turing", "has_role", "_:role"),
            ("_:role", "has_name", "phd student"),
            ("_:role", "has_time", "_:time"),
            ("_:time", "has_start", "1990"),
            ("_:time", "has_end", "2000")]


def _movies_valid():
    p = specs.wd_movies_persons()
    return [("_:movie", "has_director", p[0]),
            ("_:movie", "has_cast", p[1]),
            ("_:movie", "has_genre", "Drama film")]


def _articles_valid():
    e = specs.wd_articles_entities()
    return [("_:article", "has_author", e["persons"][0]),
            ("_:article", "cites", e["works"][0]),
            ("_:article", "has_subject", e["subjects"][0]),
            ("_:article", "published_in", e["venues"][0])]


def _mutations():
    """[(dataset, expected_violation, graph)] — one per reachable branch."""
    paths_valid = [("Amsterdam", "drive_to", "Utrecht"),
                   ("Utrecht", "cycle_to", "Breda"),
                   ("Breda", "train_to", "Delft")]
    types_valid = [("Ada", "lives_in", "Utrecht City"),
                   ("Ada", "works_at", "UvA"),
                   ("UvA", "located_in", "Utrecht City")]
    persons = specs.wd_movies_persons()
    arts = specs.wd_articles_entities()
    av = _articles_valid()
    mv = _movies_valid()
    tipr = _tipr_valid()

    cases = [
        # ---------------- syn-paths ----------------
        ("syn-paths", "empty_graph", []),
        ("syn-paths", "duplicate_triple",
         [paths_valid[0], paths_valid[0], paths_valid[2]]),
        ("syn-paths", "unknown_relation",
         [("Amsterdam", "fly_to", "Utrecht")] + paths_valid[1:]),
        ("syn-paths", "entity_is_not_a_city",
         [("Rome", "drive_to", "Utrecht")] + paths_valid[1:]),
        ("syn-paths", "self_loop",
         [("Amsterdam", "drive_to", "Amsterdam")] + paths_valid[1:]),
        ("syn-paths", "graph_is_not_length_3", paths_valid[:2]),
        ("syn-paths", "graph_is_not_length_3",
         paths_valid + [("Delft", "drive_to", "Gouda")]),
        # 3-cycle: every degree 1 but only 3 distinct nodes
        ("syn-paths", "nodes_not_distinct",
         [("Amsterdam", "drive_to", "Utrecht"),
          ("Utrecht", "cycle_to", "Breda"),
          ("Breda", "train_to", "Amsterdam")]),
        # two edges out of Amsterdam over 4 distinct nodes
        ("syn-paths", "branching_path",
         [("Amsterdam", "drive_to", "Utrecht"),
          ("Amsterdam", "cycle_to", "Breda"),
          ("Utrecht", "train_to", "Delft")]),
        # 1-edge path + 2-cycle: degrees fine, one source+sink, walk too short
        ("syn-paths", "disconnected_path",
         [("Amsterdam", "drive_to", "Utrecht"),
          ("Breda", "cycle_to", "Delft"),
          ("Delft", "train_to", "Breda")]),
        # ---------------- syn-types ----------------
        ("syn-types", "empty_graph", []),
        ("syn-types", "duplicate_triple",
         [types_valid[0], types_valid[0], types_valid[2]]),
        ("syn-types", "unknown_relation",
         [("Ada", "teaches_at", "UvA")] + types_valid[1:]),
        # domain violations per relation
        ("syn-types", "subject_not_person",
         [("UvA", "lives_in", "Utrecht City")] + types_valid[1:]),
        ("syn-types", "subject_not_person",
         [("Utrecht City", "works_at", "UvA")] + types_valid[1:]),
        ("syn-types", "subject_not_university",
         [("Ada", "located_in", "Utrecht City")] + types_valid[1:]),
        # range violations per relation
        ("syn-types", "object_not_city",
         [("Ada", "lives_in", "UvA")] + types_valid[1:]),
        ("syn-types", "object_not_university",
         [("Ada", "works_at", "Utrecht City")] + types_valid[1:]),
        ("syn-types", "object_not_city",
         [("UvA", "located_in", "Ada")] + types_valid[1:]),
        ("syn-types", "graph_is_not_length_3", types_valid[:2]),
        ("syn-types", "graph_is_not_length_3",
         types_valid + [("Femke", "lives_in", "Leiden City")]),
        # ---------------- syn-tipr ----------------
        ("syn-tipr", "empty_graph", []),
        ("syn-tipr", "duplicate_triple", tipr + [tipr[1]]),
        ("syn-tipr", "unknown_relation",
         tipr + [("_:role", "has_salary", "1990")]),
        ("syn-tipr", "missing_relation", tipr[:4]),
        ("syn-tipr", "relation_not_unique",
         tipr + [("_:time", "has_end", "2010")]),
        ("syn-tipr", "subject_not_academic",
         [("_:time", "has_role", "_:role")] + tipr[1:]),
        # role edges pointing at the wrong blank node (each of the 3 checks)
        ("syn-tipr", "role_node_mismatch",
         [("Alan Turing", "has_role", "_:time")] + tipr[1:]),
        ("syn-tipr", "role_node_mismatch",
         [tipr[0], ("_:time", "has_name", "phd student")] + tipr[2:]),
        ("syn-tipr", "role_node_mismatch",
         tipr[:2] + [("_:foo", "has_time", "_:time")] + tipr[3:]),
        ("syn-tipr", "time_node_mismatch",
         tipr[:2] + [("_:role", "has_time", "_:role")] + tipr[3:]),
        ("syn-tipr", "time_node_mismatch",
         tipr[:3] + [("_:role", "has_start", "1990"), tipr[4]]),
        ("syn-tipr", "unknown_role_name",
         tipr[:1] + [("_:role", "has_name", "janitor")] + tipr[2:]),
        ("syn-tipr", "unknown_year",
         tipr[:3] + [("_:time", "has_start", "1850"), tipr[4]]),
        ("syn-tipr", "unknown_year",
         tipr[:4] + [("_:time", "has_end", "2200")]),
        ("syn-tipr", "start_after_end",
         tipr[:3] + [("_:time", "has_start", "2000"),
                     ("_:time", "has_end", "1990")]),
        # ---------------- wd-movies ----------------
        ("wd-movies", "empty_graph", []),
        ("wd-movies", "duplicate_triple", mv + [mv[0]]),
        ("wd-movies", "subject_not_movie_node",
         [(persons[0], "has_director", persons[0])] + mv[1:]),
        ("wd-movies", "director_not_person",
         [("_:movie", "has_director", "Drama film")] + mv[1:]),
        ("wd-movies", "cast_not_person",
         [mv[0], ("_:movie", "has_cast", "Drama film"), mv[2]]),
        ("wd-movies", "genre_unknown",
         mv[:2] + [("_:movie", "has_genre", persons[2])]),
        ("wd-movies", "unknown_relation",
         mv + [("_:movie", "has_producer", persons[3])]),
        ("wd-movies", "no_director", mv[1:]),
        ("wd-movies", "no_cast", [mv[0], mv[2]]),
        # ---------------- wd-articles ----------------
        ("wd-articles", "empty_graph", []),
        ("wd-articles", "duplicate_triple", av + [av[1]]),
        ("wd-articles", "subject_not_article_node",
         [(arts["works"][0], "has_author", arts["persons"][0])] + av[1:]),
        ("wd-articles", "author_not_person",
         [("_:article", "has_author", arts["venues"][1])] + av[1:]),
        # cites / has_subject typing (round-2 VERDICT missing case #3)
        ("wd-articles", "cited_not_work",
         [av[0], ("_:article", "cites", arts["persons"][1])] + av[2:]),
        ("wd-articles", "subject_not_topic",
         av[:2] + [("_:article", "has_subject", arts["works"][1]), av[3]]),
        ("wd-articles", "venue_unknown",
         av[:3] + [("_:article", "published_in", arts["subjects"][1])]),
        ("wd-articles", "unknown_relation",
         av + [("_:article", "reviewed_by", arts["persons"][2])]),
        ("wd-articles", "no_author", av[1:]),
        ("wd-articles", "venue_count_not_one", av[:3]),       # zero venues
        ("wd-articles", "venue_count_not_one",
         av + [("_:article", "published_in", arts["venues"][2])]),
    ]
    return cases


CASES = _mutations()


@pytest.mark.parametrize("dataset,violation,graph", CASES,
                         ids=[f"{d}-{v}-{i}"
                              for i, (d, v, _) in enumerate(CASES)])
def test_mutation_fires_expected_violation(dataset, violation, graph):
    verifier = get_verifier(dataset)
    violations = verifier.evaluate_graph(graph)
    names = [v[0] for v in violations]
    assert violation in names, (
        f"{dataset}: expected {violation!r} in {names} for {graph}")
    assert not verifier.check_rules_for_graph(graph)


def test_every_reachable_branch_is_exercised():
    hit = {}
    for dataset, violation, graph in CASES:
        verifier = get_verifier(dataset)
        for name, _ in verifier.evaluate_graph(graph):
            hit.setdefault(dataset, set()).add(name)
    for dataset, branches in ALL_BRANCHES.items():
        need = branches - UNREACHABLE.get(dataset, set())
        missing = need - hit.get(dataset, set())
        assert not missing, f"{dataset}: uncovered branches {missing}"
        unknown = hit.get(dataset, set()) - branches
        assert not unknown, f"{dataset}: inventory out of date: {unknown}"


def test_valid_bases_are_valid():
    """The base graphs the mutations perturb must themselves pass (so each
    case isolates exactly its intended violation)."""
    assert get_verifier("syn-tipr").check_rules_for_graph(_tipr_valid())
    assert get_verifier("wd-movies").check_rules_for_graph(_movies_valid())
    assert get_verifier("wd-articles").check_rules_for_graph(
        _articles_valid())


def _pools(dataset):
    """Label pools per dataset, for same-pool vocab substitution."""
    if dataset == "syn-paths":
        return [specs.DUTCH_CITIES]
    if dataset == "syn-types":
        return [specs.SYN_TYPES_PERSONS, specs.SYN_TYPES_CITIES,
                specs.SYN_TYPES_UNIVERSITIES]
    if dataset == "syn-tipr":
        return [specs.SYN_TIPR_ACADEMICS, specs.SYN_TIPR_ROLES,
                specs.SYN_TIPR_YEARS, specs.SYN_TIPR_BLANKS]
    if dataset == "wd-movies":
        return [specs.wd_movies_persons(), specs.WD_MOVIES_GENRES,
                [specs.WD_MOVIES_NODE]]
    ents = specs.wd_articles_entities()
    return [ents["persons"], ents["works"], ents["subjects"], ents["venues"],
            [specs.WD_ARTICLES_NODE]]


@pytest.mark.parametrize("dataset", sorted(ALL_BRANCHES))
def test_native_engine_agrees_on_mutations(small_datasets, dataset):
    """Every mutated graph expressible in the dataset vocabulary must also
    be rejected by the C++ engine. The small test datasets only register
    entities that appear in some graph, so out-of-vocab labels are swapped
    for an in-vocab member of the SAME pool (preserving which rule the
    graph violates); labels with no pool (truly unknown strings/relations)
    drop the graph from the native comparison."""
    from ark_tpu.native import native_available
    from ark_tpu.native.engine import verify_graphs_native

    if not native_available():
        pytest.skip("native engine unavailable")
    _, _, _, (e2i, _), (r2i, _), _, _ = load_data_as_list(dataset)
    pools = _pools(dataset)
    sub = {}
    for pool in pools:
        present = [x for x in pool if x in e2i]
        for x in pool:
            if x not in e2i and present:
                sub[x] = present[0]

    def substitute(graph):
        out = []
        for s, p, o in graph:
            s, o = sub.get(s, s), sub.get(o, o)
            if s not in e2i or p not in r2i or o not in e2i:
                return None
            out.append((s, p, o))
        return out

    graphs_int, expect = [], []
    verifier = get_verifier(dataset)
    for ds, violation, graph in CASES:
        if ds != dataset or not graph:
            continue
        gl = substitute(graph)
        if gl is None:
            continue
        # substitution may merge labels (two pool members mapping to one);
        # only compare graphs the python verifier still rejects
        if verifier.check_rules_for_graph(gl):
            continue
        graphs_int.append([(e2i[s], r2i[p], e2i[o]) for s, p, o in gl])
        expect.append(violation)
    assert len(graphs_int) >= 5, f"{dataset}: too few representable cases"
    flags = verify_graphs_native(dataset, graphs_int, e2i, r2i)
    for flag, violation, gi in zip(flags, expect, graphs_int):
        assert not flag, (f"{dataset}: native accepted a graph built to "
                          f"violate {violation}: {gi}")
