"""Rule-based graph verifiers for the five benchmark datasets.

Re-implements the contract the reference consumes from
``intelligraphs.verifier.*`` (reference kgvae/model/verification.py:2-3):

  - ``evaluate_graph(labeled_graph) -> [(violation_msg, context), ...]``
    (empty list == valid; reference verification.py:66)
  - ``check_rules_for_graph(labeled_graph) -> bool``
    (reference verification.py:128, passed to SemanticEvaluator)

The rules are re-derived from the dataset schemas in ark_tpu/data/specs.py
(the external package is unavailable; SURVEY.md §7 step 5). Acceptance test:
100% of the generated train/val/test graphs must be valid
(tests/test_verifiers.py).

Graphs are label-level: lists of (subject, predicate, object) string triples.
"""

from __future__ import annotations

from ark_tpu.data import specs


class BaseVerifier:
    def evaluate_graph(self, graph):
        """Returns a list of (violation_message, context) tuples; empty == valid."""
        raise NotImplementedError

    def check_rules_for_graph(self, graph) -> bool:
        return len(self.evaluate_graph(graph)) == 0


def _dup_violations(graph):
    seen, out = set(), []
    for t in graph:
        tt = tuple(t)
        if tt in seen:
            out.append(("duplicate_triple", tt))
        seen.add(tt)
    return out


class SynPathsVerifier(BaseVerifier):
    """A valid syn-paths graph is a single directed path of exactly
    SYN_PATHS_EDGES travel edges over distinct Dutch cities."""

    def __init__(self):
        self.cities = set(specs.DUTCH_CITIES)
        self.relations = set(specs.SYN_PATHS_RELATIONS)

    def evaluate_graph(self, graph):
        v = []
        if not graph:
            return [("empty_graph", None)]
        v += _dup_violations(graph)
        for s, p, o in graph:
            if p not in self.relations:
                v.append(("unknown_relation", (s, p, o)))
            if s not in self.cities or o not in self.cities:
                v.append(("entity_is_not_a_city", (s, p, o)))
            if s == o:
                v.append(("self_loop", (s, p, o)))
        if len(graph) != specs.SYN_PATHS_EDGES:
            v.append(("graph_is_not_length_%d" % specs.SYN_PATHS_EDGES, len(graph)))
            return v
        if v:
            return v
        # connectivity: edges must chain into one path with distinct nodes
        heads = [s for s, _, _ in graph]
        tails = [o for _, _, o in graph]
        nodes = set(heads) | set(tails)
        if len(nodes) != specs.SYN_PATHS_EDGES + 1:
            v.append(("nodes_not_distinct", sorted(nodes)))
            return v
        out_deg = {n: heads.count(n) for n in nodes}
        in_deg = {n: tails.count(n) for n in nodes}
        if any(d > 1 for d in out_deg.values()) or any(d > 1 for d in in_deg.values()):
            v.append(("branching_path", None))
            return v
        sources = [n for n in nodes if in_deg[n] == 0]
        sinks = [n for n in nodes if out_deg[n] == 0]
        if len(sources) != 1 or len(sinks) != 1:
            v.append(("not_a_single_path", None))
            return v
        # walk the path from the source
        nxt = {s: o for s, _, o in graph}
        cur, steps = sources[0], 0
        while cur in nxt and steps <= len(graph):
            cur = nxt[cur]
            steps += 1
        if steps != len(graph) or cur != sinks[0]:
            v.append(("disconnected_path", None))
        return v


class SynTypesVerifier(BaseVerifier):
    """Each triple must satisfy the domain/range typing of its relation;
    a graph is exactly SYN_TYPES_EDGES distinct well-typed triples."""

    def __init__(self):
        self.pools = {
            "person": set(specs.SYN_TYPES_PERSONS),
            "city": set(specs.SYN_TYPES_CITIES),
            "university": set(specs.SYN_TYPES_UNIVERSITIES),
        }
        self.schema = dict(specs.SYN_TYPES_SCHEMA)

    def evaluate_graph(self, graph):
        v = []
        if not graph:
            return [("empty_graph", None)]
        v += _dup_violations(graph)
        for s, p, o in graph:
            if p not in self.schema:
                v.append(("unknown_relation", (s, p, o)))
                continue
            dom, rng = self.schema[p]
            if s not in self.pools[dom]:
                v.append((f"subject_not_{dom}", (s, p, o)))
            if o not in self.pools[rng]:
                v.append((f"object_not_{rng}", (s, p, o)))
        if len(graph) != specs.SYN_TYPES_EDGES:
            v.append(("graph_is_not_length_%d" % specs.SYN_TYPES_EDGES, len(graph)))
        return v


class SynTIPRVerifier(BaseVerifier):
    """The fixed 5-edge time-indexed-person-role pattern with start <= end."""

    def __init__(self):
        self.academics = set(specs.SYN_TIPR_ACADEMICS)
        self.roles = set(specs.SYN_TIPR_ROLES)
        self.years = set(specs.SYN_TIPR_YEARS)

    def evaluate_graph(self, graph):
        v = []
        if not graph:
            return [("empty_graph", None)]
        v += _dup_violations(graph)
        by_rel = {}
        for s, p, o in graph:
            by_rel.setdefault(p, []).append((s, o))
        expected = {"has_role", "has_name", "has_time", "has_start", "has_end"}
        extra = set(by_rel) - expected
        for p in extra:
            v.append(("unknown_relation", p))
        missing = expected - set(by_rel)
        for p in missing:
            v.append(("missing_relation", p))
        for p in expected & set(by_rel):
            if len(by_rel[p]) != 1:
                v.append(("relation_not_unique", p))
        if v:
            return v
        (a, role_node), = by_rel["has_role"]
        (rn_s, role_name), = by_rel["has_name"]
        (ht_s, time_node), = by_rel["has_time"]
        (st_s, start), = by_rel["has_start"]
        (en_s, end), = by_rel["has_end"]
        if a not in self.academics:
            v.append(("subject_not_academic", a))
        if role_node != "_:role" or rn_s != "_:role" or ht_s != "_:role":
            v.append(("role_node_mismatch", None))
        if time_node != "_:time" or st_s != "_:time" or en_s != "_:time":
            v.append(("time_node_mismatch", None))
        if role_name not in self.roles:
            v.append(("unknown_role_name", role_name))
        if start not in self.years or end not in self.years:
            v.append(("unknown_year", (start, end)))
        elif int(start) > int(end):
            v.append(("start_after_end", (start, end)))
        return v


class WDMoviesVerifier(BaseVerifier):
    """One central movie node; director/cast objects are persons, genre
    objects are genres; at least one director and one cast member."""

    def __init__(self):
        self.persons = set(specs.wd_movies_persons())
        self.genres = set(specs.WD_MOVIES_GENRES)
        self.node = specs.WD_MOVIES_NODE

    def evaluate_graph(self, graph):
        v = []
        if not graph:
            return [("empty_graph", None)]
        v += _dup_violations(graph)
        n_dir = n_cast = 0
        for s, p, o in graph:
            if s != self.node:
                v.append(("subject_not_movie_node", (s, p, o)))
            if p == "has_director":
                n_dir += 1
                if o not in self.persons:
                    v.append(("director_not_person", (s, p, o)))
            elif p == "has_cast":
                n_cast += 1
                if o not in self.persons:
                    v.append(("cast_not_person", (s, p, o)))
            elif p == "has_genre":
                if o not in self.genres:
                    v.append(("genre_unknown", (s, p, o)))
            else:
                v.append(("unknown_relation", (s, p, o)))
        if n_dir < 1:
            v.append(("no_director", None))
        if n_cast < 1:
            v.append(("no_cast", None))
        return v


class WDArticlesVerifier(BaseVerifier):
    """One central article node; typed objects per relation; at least one
    author and exactly one venue."""

    def __init__(self):
        ents = specs.wd_articles_entities()
        self.persons = set(ents["persons"])
        self.works = set(ents["works"])
        self.subjects = set(ents["subjects"])
        self.venues = set(ents["venues"])
        self.node = specs.WD_ARTICLES_NODE

    def evaluate_graph(self, graph):
        v = []
        if not graph:
            return [("empty_graph", None)]
        v += _dup_violations(graph)
        n_auth = n_venue = 0
        for s, p, o in graph:
            if s != self.node:
                v.append(("subject_not_article_node", (s, p, o)))
            if p == "has_author":
                n_auth += 1
                if o not in self.persons:
                    v.append(("author_not_person", (s, p, o)))
            elif p == "cites":
                if o not in self.works:
                    v.append(("cited_not_work", (s, p, o)))
            elif p == "has_subject":
                if o not in self.subjects:
                    v.append(("subject_not_topic", (s, p, o)))
            elif p == "published_in":
                n_venue += 1
                if o not in self.venues:
                    v.append(("venue_unknown", (s, p, o)))
            else:
                v.append(("unknown_relation", (s, p, o)))
        if n_auth < 1:
            v.append(("no_author", None))
        if n_venue != 1:
            v.append(("venue_count_not_one", n_venue))
        return v


def get_verifier(dataset_name: str):
    """Verifier registry (reference verification.py:7-16)."""
    verifiers = {
        "syn-paths": SynPathsVerifier,
        "syn-tipr": SynTIPRVerifier,
        "syn-types": SynTypesVerifier,
        "wd-movies": WDMoviesVerifier,
        "wd-articles": WDArticlesVerifier,
    }
    cls = verifiers.get(dataset_name)
    return cls() if cls is not None else None
