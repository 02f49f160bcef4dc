"""Taxonomy side-car index: stable facet-label ordinals + parent arrays.

The reference keeps hierarchical facet labels in a SEPARATE taxonomy
index (facet/taxonomy/directory/DirectoryTaxonomyWriter.java: addCategory
assigns each new path a monotonically growing int ordinal, recursively
adding parents first; facet/taxonomy/ParallelTaxonomyArrays.java exposes
the int[] parents array; facet/taxonomy/directory/DirectoryTaxonomyReader
.java maps ordinal <-> path).  Facet counting then runs on small int
ordinals instead of strings (facet/taxonomy/FastTaxonomyFacetCounts.java)
and hierarchical dims roll child counts up into parents
(TaxonomyFacets.java rollup).

Ray-Data-native shape:

- The taxonomy is a tiny, append-only artifact (``taxonomy.json`` under
  the index root, atomic-rename published through the store seam):
  ordinal -> (path, parent_ordinal), root = ordinal 0 with path "".
  Taxonomies are SMALL by definition (label sets, not doc sets), so the
  writer's distinct-path input is a bounded aggregate, never doc-scale.
- ``TaxonomyWriter.add_categories`` preserves every existing ordinal
  (the reference's central invariant: ordinals are forever) and assigns
  NEW paths ordinals in sorted order — deterministic under distributed
  recomputation, unlike the reference's arrival-order assignment (a
  documented deviation; arrival order is nondeterministic under Ray task
  scheduling, sorted order is reproducible).
- Counting: per-segment ``np.bincount`` partials over leaf ordinals ride
  the same (facet, qid, value, n) exchange as every other facet family
  arm; the parent ROLLUP runs on the summed ordinal vector with one
  ``np.add.at`` over the parents array (children before parents because
  parents always receive smaller ordinals than their children).
"""

from __future__ import annotations

import numpy as np

from .. import store


class TaxonomyReader:
    """Immutable view: ordinal <-> path + parents array."""

    def __init__(self, paths: list[str], parents: np.ndarray):
        self.paths = list(paths)
        self.parents = np.asarray(parents, np.int64)
        self._ord = {p: i for i, p in enumerate(self.paths)}

    # DirectoryTaxonomyReader.getOrdinal / getPath
    def ordinal(self, path: str) -> int:
        return self._ord.get(path, -1)

    def path(self, ordinal: int) -> str:
        return self.paths[ordinal]

    def __len__(self) -> int:
        return len(self.paths)

    def rollup(self, counts: np.ndarray) -> np.ndarray:
        """TaxonomyFacets rollup: add each ordinal's count into its
        parent, deepest ordinals first.  Parents precede children in
        ordinal order (add_categories adds prefixes first), so one
        reverse sweep suffices."""
        out = np.asarray(counts, np.int64).copy()
        for o in range(len(out) - 1, 0, -1):
            p = int(self.parents[o])
            if p >= 0 and out[o]:
                out[p] += out[o]
        return out


class TaxonomyWriter:
    """Append-only ordinal assignment over a persisted taxonomy artifact."""

    def __init__(self, path: str):
        self.path = path
        if store.exists(path):
            data = store.read_json(path)
            self.paths: list[str] = data["paths"]
            self.parents: list[int] = data["parents"]
        else:
            self.paths = [""]  # root ordinal 0 (INVALID parent -1)
            self.parents = [-1]
        self._ord = {p: i for i, p in enumerate(self.paths)}

    def _add_one(self, path: str) -> int:
        o = self._ord.get(path)
        if o is not None:
            return o
        # parents first (DirectoryTaxonomyWriter.internalAddCategory
        # recursion), so a parent's ordinal is always below its child's
        parent = self._add_one(path.rsplit("/", 1)[0] if "/" in path else "")
        o = len(self.paths)
        self.paths.append(path)
        self.parents.append(parent)
        self._ord[path] = o
        return o

    def add_categories(self, paths) -> dict[str, int]:
        """Assign ordinals to every path (and its prefix parents); new
        paths get ordinals in SORTED order (determinism deviation, see
        module docstring).  Returns path -> ordinal for the inputs."""
        for p in sorted(set(paths)):
            self._add_one(p)
        return {p: self._ord[p] for p in paths}

    def commit(self) -> None:
        store.write_json_atomic(
            self.path, {"paths": self.paths, "parents": self.parents}
        )

    def reader(self) -> TaxonomyReader:
        return TaxonomyReader(self.paths, np.array(self.parents, np.int64))


def load_taxonomy(path: str) -> TaxonomyReader:
    data = store.read_json(path)
    return TaxonomyReader(data["paths"], np.array(data["parents"], np.int64))
