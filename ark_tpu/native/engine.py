"""ctypes bindings + dataset metadata for the native host-eval engine
(ark_tpu/native/verifier.cpp).

The shared library is compiled on first use with the system C++ toolchain
and cached next to this module. When no compiler is available the callers
fall back to the pure-Python verifiers (ark_tpu/eval/verifiers.py), which
remain the semantic spec — tests/test_native_verifier.py asserts agreement.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading

import numpy as np

from ark_tpu.data import specs

_LIB = None
_LIB_LOCK = threading.Lock()
_BUILD_FAILED = False

DATASET_KIND = {"syn-paths": 0, "syn-types": 1, "syn-tipr": 2,
                "wd-movies": 3, "wd-articles": 4}


def _src_path() -> str:
    return os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "verifier.cpp")


def _lib_path() -> str:
    # the cached library name embeds the source hash: stale binaries can
    # never be picked up after verifier.cpp changes (git checkout mtimes are
    # arbitrary, so an mtime check is not reliable), and the build artifact
    # is gitignored rather than committed.
    with open(_src_path(), "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    return os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        f"_ark_native_{digest}.so")


def _load() -> ctypes.CDLL | None:
    global _LIB, _BUILD_FAILED
    if _LIB is not None or _BUILD_FAILED:
        return _LIB
    with _LIB_LOCK:
        if _LIB is not None or _BUILD_FAILED:
            return _LIB
        # everything (build AND load/symbol setup) falls back to the
        # pure-Python verifiers on failure, as the module docstring promises
        try:
            so = _lib_path()
            if not os.path.exists(so):
                subprocess.run(
                    ["g++", "-O2", "-std=c++17", "-shared", "-fPIC",
                     "-o", so, _src_path()],
                    check=True, capture_output=True)
            lib = ctypes.CDLL(so)
            lib.ark_verify_graphs.restype = None
            lib.ark_graph_hashes.restype = None
        except Exception as e:  # no compiler / build / load error
            print(f"[ark_tpu.native] native engine unavailable, using "
                  f"Python fallback: {e}")
            _BUILD_FAILED = True
            return None
        _LIB = lib
        return _LIB


def native_available() -> bool:
    return _load() is not None


def _csr(graphs):
    """List of int-triple graphs -> (flat [m,3] int32, offsets int64)."""
    offsets = np.zeros(len(graphs) + 1, np.int64)
    for i, g in enumerate(graphs):
        offsets[i + 1] = offsets[i] + len(g)
    flat = np.zeros((int(offsets[-1]), 3), np.int32)
    for i, g in enumerate(graphs):
        if g:
            flat[offsets[i]:offsets[i + 1]] = np.asarray(g, np.int32)
    return flat, offsets


def _dataset_meta(name, e2i, r2i):
    """Entity-class / payload / relation-kind arrays per dataset (the
    int-level mirror of the label rules in eval/verifiers.py)."""
    n_e, n_r = len(e2i), len(r2i)
    eclass = np.full(n_e, -1, np.int8)
    evalue = np.full(n_e, -1, np.int32)
    rkind = np.full(n_r, -1, np.int8)
    central = -1
    edges_expected = -1

    def set_ents(labels, cls):
        for lab in labels:
            if lab in e2i:
                eclass[e2i[lab]] = cls

    if name == "syn-paths":
        set_ents(specs.DUTCH_CITIES, 0)
        for i, r in enumerate(specs.SYN_PATHS_RELATIONS):
            if r in r2i:
                rkind[r2i[r]] = 0
        edges_expected = specs.SYN_PATHS_EDGES
    elif name == "syn-types":
        set_ents(specs.SYN_TYPES_PERSONS, 0)
        set_ents(specs.SYN_TYPES_CITIES, 1)
        set_ents(specs.SYN_TYPES_UNIVERSITIES, 2)
        cls = {"person": 0, "city": 1, "university": 2}
        for r, (dom, rng) in specs.SYN_TYPES_SCHEMA.items():
            if r in r2i:
                rkind[r2i[r]] = cls[dom] * 4 + cls[rng]
        edges_expected = specs.SYN_TYPES_EDGES
    elif name == "syn-tipr":
        set_ents(specs.SYN_TIPR_ACADEMICS, 0)
        set_ents(specs.SYN_TIPR_ROLES, 1)
        set_ents(specs.SYN_TIPR_YEARS, 2)
        for y in specs.SYN_TIPR_YEARS:
            if y in e2i:
                evalue[e2i[y]] = int(y)
        if "_:role" in e2i:
            eclass[e2i["_:role"]] = 3
        if "_:time" in e2i:
            eclass[e2i["_:time"]] = 4
        for i, r in enumerate(specs.SYN_TIPR_RELATIONS):
            if r in r2i:
                rkind[r2i[r]] = i
    elif name == "wd-movies":
        set_ents(specs.wd_movies_persons(), 0)
        set_ents(specs.WD_MOVIES_GENRES, 1)
        if specs.WD_MOVIES_NODE in e2i:
            central = e2i[specs.WD_MOVIES_NODE]
            eclass[central] = 2
        for i, r in enumerate(specs.WD_MOVIES_RELATIONS):
            if r in r2i:
                rkind[r2i[r]] = i
    elif name == "wd-articles":
        ents = specs.wd_articles_entities()
        set_ents(ents["persons"], 0)
        set_ents(ents["works"], 1)
        set_ents(ents["subjects"], 2)
        set_ents(ents["venues"], 3)
        if specs.WD_ARTICLES_NODE in e2i:
            central = e2i[specs.WD_ARTICLES_NODE]
            eclass[central] = 4
        for i, r in enumerate(specs.WD_ARTICLES_RELATIONS):
            if r in r2i:
                rkind[r2i[r]] = i
    else:
        raise ValueError(f"unknown dataset {name}")
    return eclass, evalue, rkind, central, edges_expected


def verify_graphs_native(name, graphs, e2i, r2i) -> np.ndarray:
    """Validity flags (uint8 [n]) for int-triple graphs under the dataset's
    rules; exact agreement with eval/verifiers.py enforced by tests."""
    lib = _load()
    assert lib is not None
    flat, offsets = _csr(graphs)
    eclass, evalue, rkind, central, edges = _dataset_meta(name, e2i, r2i)
    out = np.zeros(len(graphs), np.uint8)
    lib.ark_verify_graphs(
        ctypes.c_int(DATASET_KIND[name]),
        flat.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ctypes.c_int64(len(graphs)),
        eclass.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
        evalue.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.c_int64(len(e2i)),
        rkind.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
        ctypes.c_int64(len(r2i)),
        ctypes.c_int32(central), ctypes.c_int32(edges),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return out


def graph_hashes_native(graphs, n_entities, n_relations):
    """(canonical 64-bit hashes, empty flags) per graph."""
    lib = _load()
    assert lib is not None
    flat, offsets = _csr(graphs)
    hashes = np.zeros(len(graphs), np.uint64)
    empty = np.zeros(len(graphs), np.uint8)
    lib.ark_graph_hashes(
        flat.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ctypes.c_int64(len(graphs)),
        ctypes.c_int64(n_entities), ctypes.c_int64(n_relations),
        hashes.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        empty.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return hashes, empty


class NativeSemanticEvaluator:
    """Drop-in for eval.semantic.SemanticEvaluator operating on INT graphs
    (before label mapping): same ``organized_results`` percentage surface.
    The ground-truth hash set is computed once and cached per dataset,
    keyed by CONTENT (length + a sampled triple digest), not object id —
    Python recycles ids after GC, which could silently reuse a stale
    ground-truth set for different train data (custom split sizes,
    ARK_TPU_DATA_DIR overrides)."""

    _gt_cache: dict = {}

    @staticmethod
    def _content_key(name, graphs):
        h = hashlib.sha256()
        h.update(str(len(graphs)).encode())
        # sample a deterministic subset; hashing every triple of a large
        # train split each call would defeat the cache's purpose
        step = max(1, len(graphs) // 64)
        for g in graphs[::step]:
            h.update(str(len(g)).encode())
            if g:
                h.update(str(g[0]).encode())
                h.update(str(g[-1]).encode())
        return (name, h.hexdigest())

    def __init__(self, name, predicted_graphs_int, train_graphs_int, e2i, r2i):
        self.name = name
        key = self._content_key(name, train_graphs_int)
        if key not in self._gt_cache:
            gt_hashes, _ = graph_hashes_native(train_graphs_int, len(e2i),
                                               len(r2i))
            self._gt_cache[key] = set(gt_hashes.tolist())
        gt = self._gt_cache[key]

        valid = verify_graphs_native(name, predicted_graphs_int, e2i, r2i)
        hashes, empty = graph_hashes_native(predicted_graphs_int, len(e2i),
                                            len(r2i))
        novel = np.asarray([h not in gt for h in hashes.tolist()], bool)
        n = len(predicted_graphs_int)
        valid = valid.astype(bool) & ~empty.astype(bool)
        pct = (lambda c: 100.0 * float(c) / n if n else 0.0)
        self.organized_results = {
            "results": {
                "semantics": pct(valid.sum()),
                "novel": pct(novel.sum()),
                "novel_semantics": pct((valid & novel).sum()),
                "empty": pct(empty.sum()),
            },
            "counts": {
                "total": n,
                "valid": int(valid.sum()),
                "novel": int(novel.sum()),
                "valid_novel": int((valid & novel).sum()),
                "empty": int(empty.sum()),
            },
        }

    def print_results(self):
        r = self.organized_results["results"]
        c = self.organized_results["counts"]
        print(f"  graphs evaluated : {c['total']}")
        print(f"  valid (semantics): {r['semantics']:.2f}%")
        print(f"  novel            : {r['novel']:.2f}%")
        print(f"  valid & novel    : {r['novel_semantics']:.2f}%")
        print(f"  empty graphs     : {r['empty']:.2f}%")
