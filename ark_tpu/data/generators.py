"""Procedural generators for the five benchmark datasets.

Each generator emits label-level graphs — a graph is a list of
``(subject, predicate, object)`` string triples — that are valid by
construction under the matching verifier in ``ark_tpu/eval/verifiers.py``
(acceptance test: tests/test_verifiers.py requires 100% validity).

Generation is deterministic (numpy Generator seeded per dataset,
ark_tpu/data/specs.py GEN_SEEDS) and fully vectorized where it matters
(wd-articles emits ~1M triples).
"""

from __future__ import annotations

import numpy as np

from ark_tpu.data import specs

Graph = list  # list[tuple[str, str, str]]


def _rng(name: str, seed_offset: int = 0) -> np.random.Generator:
    return np.random.default_rng(specs.GEN_SEEDS[name] + seed_offset)


# ---------------------------------------------------------------------------
# syn-paths
# ---------------------------------------------------------------------------

def gen_syn_paths(n: int, rng: np.random.Generator) -> list[Graph]:
    cities = specs.DUTCH_CITIES
    rels = specs.SYN_PATHS_RELATIONS
    k = specs.SYN_PATHS_EDGES
    # nodes: k+1 distinct cities per graph (vectorized partial shuffles)
    node_idx = np.argsort(rng.random((n, len(cities))), axis=1)[:, : k + 1]
    rel_idx = rng.integers(0, len(rels), size=(n, k))
    graphs = []
    for i in range(n):
        g = []
        for j in range(k):
            g.append((cities[node_idx[i, j]], rels[rel_idx[i, j]],
                      cities[node_idx[i, j + 1]]))
        graphs.append(g)
    return graphs


# ---------------------------------------------------------------------------
# syn-types
# ---------------------------------------------------------------------------

def gen_syn_types(n: int, rng: np.random.Generator) -> list[Graph]:
    pools = {
        "person": specs.SYN_TYPES_PERSONS,
        "city": specs.SYN_TYPES_CITIES,
        "university": specs.SYN_TYPES_UNIVERSITIES,
    }
    rel_names = list(specs.SYN_TYPES_SCHEMA.keys())
    graphs = []
    for _ in range(n):
        g = set()
        while len(g) < specs.SYN_TYPES_EDGES:
            r = rel_names[rng.integers(0, len(rel_names))]
            dom, rng_t = specs.SYN_TYPES_SCHEMA[r]
            s = pools[dom][rng.integers(0, len(pools[dom]))]
            o = pools[rng_t][rng.integers(0, len(pools[rng_t]))]
            g.add((s, r, o))
        graphs.append(sorted(g))
    return graphs


# ---------------------------------------------------------------------------
# syn-tipr
# ---------------------------------------------------------------------------

def gen_syn_tipr(n: int, rng: np.random.Generator) -> list[Graph]:
    academics = specs.SYN_TIPR_ACADEMICS
    roles = specs.SYN_TIPR_ROLES
    years = specs.SYN_TIPR_YEARS
    a_idx = rng.integers(0, len(academics), size=n)
    r_idx = rng.integers(0, len(roles), size=n)
    y1 = rng.integers(0, len(years), size=n)
    # end year >= start year, within 8 years
    span = rng.integers(0, 9, size=n)
    y2 = np.minimum(y1 + span, len(years) - 1)
    graphs = []
    for i in range(n):
        graphs.append([
            (academics[a_idx[i]], "has_role", "_:role"),
            ("_:role", "has_name", roles[r_idx[i]]),
            ("_:role", "has_time", "_:time"),
            ("_:time", "has_start", years[y1[i]]),
            ("_:time", "has_end", years[y2[i]]),
        ])
    return graphs


# ---------------------------------------------------------------------------
# wd-movies
# ---------------------------------------------------------------------------

def gen_wd_movies(n: int, rng: np.random.Generator) -> list[Graph]:
    persons = specs.wd_movies_persons()
    genres = specs.WD_MOVIES_GENRES
    node = specs.WD_MOVIES_NODE
    graphs = []
    for _ in range(n):
        nd = rng.integers(specs.WD_MOVIES_N_DIRECTORS[0], specs.WD_MOVIES_N_DIRECTORS[1] + 1)
        nc = rng.integers(specs.WD_MOVIES_N_CAST[0], specs.WD_MOVIES_N_CAST[1] + 1)
        ng = rng.integers(specs.WD_MOVIES_N_GENRES[0], specs.WD_MOVIES_N_GENRES[1] + 1)
        dirs = rng.choice(len(persons), size=nd, replace=False)
        cast = rng.choice(len(persons), size=nc, replace=False)
        gens = rng.choice(len(genres), size=ng, replace=False)
        g = [(node, "has_director", persons[i]) for i in dirs]
        g += [(node, "has_cast", persons[i]) for i in cast]
        g += [(node, "has_genre", genres[i]) for i in gens]
        graphs.append(g)
    return graphs


# ---------------------------------------------------------------------------
# wd-articles
# ---------------------------------------------------------------------------

def gen_wd_articles(n: int, rng: np.random.Generator) -> list[Graph]:
    ents = specs.wd_articles_entities()
    node = specs.WD_ARTICLES_NODE
    graphs = []
    for _ in range(n):
        na = rng.integers(specs.WD_ARTICLES_N_AUTHORS[0], specs.WD_ARTICLES_N_AUTHORS[1] + 1)
        ncit = rng.integers(specs.WD_ARTICLES_N_CITES[0], specs.WD_ARTICLES_N_CITES[1] + 1)
        ns = rng.integers(specs.WD_ARTICLES_N_SUBJ[0], specs.WD_ARTICLES_N_SUBJ[1] + 1)
        authors = rng.choice(specs.WD_ARTICLES_N_PERSONS, size=na, replace=False)
        cites = rng.choice(specs.WD_ARTICLES_N_WORKS, size=ncit, replace=False)
        subjects = rng.choice(specs.WD_ARTICLES_N_SUBJECTS, size=ns, replace=False)
        venue = rng.integers(0, specs.WD_ARTICLES_N_VENUES)
        g = [(node, "has_author", ents["persons"][i]) for i in authors]
        g += [(node, "cites", ents["works"][i]) for i in cites]
        g += [(node, "has_subject", ents["subjects"][i]) for i in subjects]
        g.append((node, "published_in", ents["venues"][venue]))
        graphs.append(g)
    return graphs


GENERATORS = {
    "syn-paths": gen_syn_paths,
    "syn-types": gen_syn_types,
    "syn-tipr": gen_syn_tipr,
    "wd-movies": gen_wd_movies,
    "wd-articles": gen_wd_articles,
}


def generate_splits(name: str, sizes=None) -> tuple[list[Graph], list[Graph], list[Graph]]:
    """Generate (train, valid, test) label-level graph splits for a dataset."""
    sizes = sizes or specs.SPLIT_SIZES[name]
    gen = GENERATORS[name]
    out = []
    for split_i, sz in enumerate(sizes):
        out.append(gen(sz, _rng(name, seed_offset=split_i)))
    return tuple(out)
