"""Host-side dataset pipeline: the IntelliGraphs loader contract.

Replaces the external `intelligraphs` package the reference imports
(reference: kgvae/experiments/train.py:14-16):

  - ``DatasetDownloader``: check/materialize/verify datasets on disk
    (reference usage train.py:298-306). Here "download" = deterministic
    procedural generation (no network egress), verified by sha256.
  - ``load_data_as_list(name)``: returns
    ``(train, val, test, (e2i, i2e), (r2i, i2r), (min_edges, max_edges), meta)``
    where each split is a list of graphs of int (h, r, t) triples
    (contract: reference train.py:328).
  - ``get_file_paths`` / ``parse_files_to_subgraphs``: raw label-level graph
    access (contract: reference interpolation.py:22, 94-95).

On-disk format mirrors the IntelliGraphs .tsv layout: one triple per line as
``subject\\tpredicate\\tobject``, graphs separated by blank lines.
"""

from __future__ import annotations

import hashlib
import json
import os
from pathlib import Path

from ark_tpu.data import specs
from ark_tpu.data.generators import generate_splits

DATASET_NAMES = ["syn-paths", "syn-types", "syn-tipr", "wd-movies", "wd-articles"]
_SPLITS = ["train", "valid", "test"]


def data_root() -> Path:
    root = os.environ.get("ARK_TPU_DATA_DIR")
    if root:
        return Path(root)
    return Path.cwd() / ".ark_tpu_data"


def _dataset_dir(name: str) -> Path:
    return data_root() / name


def get_file_paths(name: str) -> tuple[str, str, str]:
    """Paths of the (train, valid, test) .tsv files for a dataset."""
    d = _dataset_dir(name)
    return tuple(str(d / f"{s}.tsv") for s in _SPLITS)


def _write_split(path: Path, graphs) -> str:
    """Write graphs in IntelliGraphs tsv layout; returns sha256 of the file."""
    h = hashlib.sha256()
    with open(path, "w", encoding="utf-8") as f:
        for g in graphs:
            block = "".join(f"{s}\t{p}\t{o}\n" for (s, p, o) in g) + "\n"
            f.write(block)
            h.update(block.encode("utf-8"))
    return h.hexdigest()


def _count_graphs(path) -> int:
    """Count (and format-check) the graphs in one split file: tab-separated
    triples, blank-line graph separators — the IntelliGraphs tsv layout."""
    n, cur = 0, 0
    with open(path, "r", encoding="utf-8") as f:
        for line in f:
            line = line.rstrip("\n")
            if not line.strip():
                if cur:
                    n += 1
                    cur = 0
                continue
            if len(line.split("\t")) != 3:
                raise ValueError(f"Malformed triple line in {path!r}: {line!r}")
            cur += 1
    return n + (1 if cur else 0)


def parse_files_to_subgraphs(train_file, valid_file, test_file, split_tab=True):
    """Parse tsv files into label-level graphs (reference contract:
    interpolation.py:94-95). ``split_tab=True`` splits lines on tabs;
    otherwise on arbitrary whitespace runs (labels here may contain spaces,
    so tab splitting is the lossless mode)."""
    out = []
    for path in (train_file, valid_file, test_file):
        graphs, cur = [], []
        with open(path, "r", encoding="utf-8") as f:
            for line in f:
                line = line.rstrip("\n")
                if not line.strip():
                    if cur:
                        graphs.append(cur)
                        cur = []
                    continue
                parts = line.split("\t") if split_tab else line.split()
                if len(parts) != 3:
                    raise ValueError(f"Malformed triple line in {path!r}: {line!r}")
                cur.append(tuple(parts))
        if cur:
            graphs.append(cur)
        out.append(graphs)
    return tuple(out)


class DatasetDownloader:
    """Materializes and verifies the benchmark datasets on local disk.

    API parity with the `intelligraphs` DatasetDownloader used by the
    reference (train.py:298-306): ``check_datasets_exist()``,
    ``download_and_verify_all()``, ``verify_datasets()``. Since this
    environment has no network egress, "downloading" runs the deterministic
    generators in ark_tpu/data/generators.py, then records per-split sha256
    checksums in ``meta.json`` that later verification checks against.
    """

    def __init__(self, names=None):
        self.names = list(names or DATASET_NAMES)

    def _meta_path(self, name: str) -> Path:
        return _dataset_dir(name) / "meta.json"

    def check_datasets_exist(self) -> bool:
        for name in self.names:
            if not self._meta_path(name).exists():
                return False
            for p in get_file_paths(name):
                if not Path(p).exists():
                    return False
        return True

    def download_dataset(self, name: str, sizes=None) -> None:
        d = _dataset_dir(name)
        d.mkdir(parents=True, exist_ok=True)
        # Bring-your-own data: if the split files are already on disk (e.g.
        # the REAL IntelliGraphs tsv exports copied in by the user) but no
        # meta.json marks them as ours, ADOPT them — never overwrite user
        # data with generated surrogates.
        existing = [Path(p) for p in get_file_paths(name)]
        have = [p for p in existing if p.exists()]
        if have and not self._meta_path(name).exists():
            if len(have) == len(existing):
                self._adopt_external(name, existing)
                return
            # SOME split files exist but not all, and nothing marks them as
            # generated — they may be real user exports. Refuse rather than
            # silently overwrite ("never overwrite user data"); a partial
            # copy is a user error to resolve, not ours to paper over.
            missing = [str(p) for p in existing if not p.exists()]
            raise FileExistsError(
                f"dataset '{name}': found existing split file(s) "
                f"{[str(p) for p in have]} without meta.json, but "
                f"{missing} are missing. Refusing to generate surrogate "
                "data over possible user files — supply all of "
                f"{[p.name for p in existing]} (bring-your-own data, "
                "docs/DATASETS.md) or remove the partial files to get "
                "generated surrogates.")
        if have and self._meta_path(name).exists() and len(have) != len(
                existing):
            # meta exists but a split file vanished: if the meta says the
            # data was user-supplied, regenerating would replace the
            # REMAINING real files with surrogates
            with open(self._meta_path(name)) as f:
                if json.load(f).get("source") == "external":
                    raise FileExistsError(
                        f"dataset '{name}': adopted external data is "
                        "missing some split files; restore them or delete "
                        f"the whole directory {_dataset_dir(name)} to "
                        "regenerate surrogates")
        splits = generate_splits(name, sizes=sizes)
        checksums = {}
        for split_name, graphs in zip(_SPLITS, splits):
            checksums[split_name] = _write_split(d / f"{split_name}.tsv", graphs)
        meta = {
            "dataset": name,
            "splits": {s: len(g) for s, g in zip(_SPLITS, splits)},
            "sha256": checksums,
            "generator_seed": specs.GEN_SEEDS[name],
        }
        with open(self._meta_path(name), "w") as f:
            json.dump(meta, f, indent=2)

    def _adopt_external(self, name: str, paths) -> None:
        """Register user-provided split files (checksums so later
        ``verify_datasets`` guards their integrity like generated ones)."""
        counts = {}
        for split, path in zip(_SPLITS, paths):
            graphs = _count_graphs(path)
            if graphs == 0:
                raise ValueError(
                    f"External dataset file {path} contains no graphs "
                    "(expected tab-separated triples, blank-line-separated "
                    "graphs)")
            counts[split] = graphs
        meta = {
            "dataset": name,
            "splits": counts,
            "sha256": {s: hashlib.sha256(p.read_bytes()).hexdigest()
                       for s, p in zip(_SPLITS, paths)},
            "source": "external",
        }
        with open(self._meta_path(name), "w") as f:
            json.dump(meta, f, indent=2)
        print(f"[ark_tpu.data] adopted external data for {name} "
              f"({counts['train']}/{counts['valid']}/{counts['test']} graphs)")

    def download_and_verify_all(self) -> None:
        for name in self.names:
            if not self._meta_path(name).exists():
                print(f"[ark_tpu.data] materializing dataset {name} ...")
                self.download_dataset(name)
        self.verify_datasets()

    def verify_datasets(self) -> bool:
        for name in self.names:
            with open(self._meta_path(name)) as f:
                meta = json.load(f)
            for split in _SPLITS:
                path = Path(get_file_paths(name)[_SPLITS.index(split)])
                h = hashlib.sha256(path.read_bytes()).hexdigest()
                if h != meta["sha256"][split]:
                    raise ValueError(
                        f"Checksum mismatch for {name}/{split}: {h} != {meta['sha256'][split]}"
                    )
        return True


def ensure_dataset(name: str, sizes=None) -> None:
    dl = DatasetDownloader(names=[name])
    if not dl.check_datasets_exist():
        dl.download_dataset(name, sizes=sizes)


def load_data_as_list(name: str):
    """IntelliGraphs ``load_data_as_list`` contract (reference train.py:328).

    Returns ``(train_g, val_g, test_g, (e2i, i2e), (r2i, i2r),
    (min_edges, max_edges), labels)`` where each ``*_g`` is a list of graphs,
    each graph a list of int ``(h, r, t)`` triples indexed by the returned
    vocab maps. Vocab order: sorted unique labels over all three splits
    (deterministic).
    """
    ensure_dataset(name)
    train_raw, val_raw, test_raw = parse_files_to_subgraphs(*get_file_paths(name))

    entities, relations = set(), set()
    for split in (train_raw, val_raw, test_raw):
        for g in split:
            for s, p, o in g:
                entities.add(s)
                entities.add(o)
                relations.add(p)
    e_list = sorted(entities)
    r_list = sorted(relations)
    e2i = {e: i for i, e in enumerate(e_list)}
    r2i = {r: i for i, r in enumerate(r_list)}
    i2e = {i: e for e, i in e2i.items()}
    i2r = {i: r for r, i in r2i.items()}

    def _index(split):
        return [[(e2i[s], r2i[p], e2i[o]) for (s, p, o) in g] for g in split]

    train_g, val_g, test_g = _index(train_raw), _index(val_raw), _index(test_raw)
    lens = [len(g) for split in (train_g, val_g, test_g) for g in split]
    min_edges, max_edges = min(lens), max(lens)
    labels = (e_list, r_list)
    return train_g, val_g, test_g, (e2i, i2e), (r2i, i2r), (min_edges, max_edges), labels
