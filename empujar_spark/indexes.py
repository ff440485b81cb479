"""Warehouse index registry: named indexes, provenance, staleness.

Five stored-index shapes grew up ad hoc — BM25 (postings/dfreq/doclen/
stats, operators/text.py), IVF (centroids/assignments), PQ (codes/
codebooks), the bloom ingest bitmap, and the minhash band history. Each
invented its own table layout and its own session cache, and none
recorded WHAT it was built from, so "is this index stale?" had no
answer. The registry unifies them:

- an index is registered under a **name** with a **kind** and its
  component DataFrames; components commit as Warehouse tables
  (``__idx_{name}__{component}``) through the versioned-commit path, so
  a rebuild atomically supersedes the old index under concurrent
  readers (``replace_table``);
- the manifest (``_indexes.json``, atomic write-aside + rename like the
  ``_current`` pointers) records **provenance**: for a warehouse source
  table, the ``data-v{N}`` version it was built from; for an external
  parquet path, a listing fingerprint (name/size/mtime digest);
- **staleness** is then a pure metadata check, the index-registry
  analogue of ``quality.expect_fresh``: the source advanced past the
  recorded build point ⇒ ``stale=True``. A stale index still SERVES —
  an ANN or BM25 index one ingest behind is the normal steady state at
  100 TB — the flag is what lets a pipeline gate on freshness or
  schedule the rebuild, instead of discovering drift from bad recalls.

Vacuum interaction: provenance stores the source's version NUMBER, not
a path into its history, so pruning/vacuuming old source versions never
invalidates the check — the current version number survives vacuum.

Reference behavioral parity: provenance-tracked derived tables extend
the reference's MAX-watermark incremental contract (lib/book.js
getMax pattern — "what have I already processed?") from rows to whole
index artifacts; cited as extension surface, not a port.
"""

from __future__ import annotations

import hashlib
import json
import os
from typing import TYPE_CHECKING

if TYPE_CHECKING:
    from pyspark.sql import DataFrame

    from empujar_spark.catalog import Warehouse

KINDS = ("bm25", "ivf", "pq", "bloom", "minhash_bands", "custom")


def _path_fingerprint(path: str) -> str:
    """Cheap listing digest for an external source: file names, sizes,
    mtimes — no data read. A rewritten/appended source changes it."""
    entries = []
    if os.path.isdir(path):
        for name in sorted(os.listdir(path)):
            st = os.stat(os.path.join(path, name))
            entries.append((name, st.st_size, st.st_mtime_ns))
    else:
        st = os.stat(path)
        entries.append((os.path.basename(path), st.st_size, st.st_mtime_ns))
    return hashlib.md5(json.dumps(entries).encode()).hexdigest()


class IndexRegistry:
    """Named stored indexes over a :class:`Warehouse`."""

    def __init__(self, wh: "Warehouse") -> None:
        self.wh = wh
        self._manifest_path = os.path.join(wh.path, "_indexes.json")

    # ------------------------------------------------------------ manifest
    def _load(self) -> dict:
        try:
            with open(self._manifest_path) as fh:
                return json.load(fh)
        except (OSError, ValueError):
            return {}

    def _save(self, manifest: dict) -> None:
        tmp = self._manifest_path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(manifest, fh, indent=1, sort_keys=True)
        os.replace(tmp, self._manifest_path)

    def _component_table(self, name: str, component: str, gen: int) -> str:
        return f"__idx_{name}__g{gen}__{component}"

    # ------------------------------------------------------------- lifecycle
    def register(
        self,
        name: str,
        kind: str,
        components: dict[str, "DataFrame"],
        source_table: str | None = None,
        source_path: str | None = None,
        params: dict | None = None,
        partition_cols: dict[str, list[str]] | None = None,
        cluster_by: dict[str, list[str]] | None = None,
        cluster_files: int = 32,
    ) -> dict:
        """Commit ``components`` as warehouse tables and record the
        manifest entry. Re-registering a name REPLACES the old index
        (versioned commits: readers of the old component tables are
        isolated). Exactly one of ``source_table`` (a table in this
        warehouse — provenance is its current data version) or
        ``source_path`` (external parquet — provenance is a listing
        fingerprint) must be given. ``partition_cols`` maps component →
        hive-partition columns (e.g. IVF assignments on ``cid`` so a
        probe prunes to its nprobe inverted lists). ``cluster_by`` maps
        component → range-cluster columns: rows are range-partitioned
        and sorted so each parquet file covers a narrow key slice —
        pushed equality/IN predicates (BM25's query-term filter) then
        skip whole files via footer min/max; size ``cluster_files`` so
        files land near the parquet sweet spot at your scale.

        ATOMICITY: component tables are GENERATION-suffixed
        (``__idx_{name}__g{N}__{comp}``) and the manifest is the
        multi-table pointer — all of generation N+1 is written BEFORE
        the single atomic manifest flip, so a rebuild that dies midway
        leaves the old generation fully live and consistent (a mixed
        new-postings/old-dfreq index can never be served). The
        predecessor generation is retained one flip as reader grace,
        then dropped — the same keep-then-prune contract as the
        warehouse's versioned data commits."""
        if kind not in KINDS:
            raise ValueError(f"unknown index kind {kind!r}; one of {KINDS}")
        if (source_table is None) == (source_path is None):
            raise ValueError("exactly one of source_table/source_path required")
        if source_table is not None:
            versions = self.wh.table_versions(source_table)  # raises if missing
            built = {"table": source_table, "version": versions[-1]}
        else:
            built = {"path": source_path,
                     "fingerprint": _path_fingerprint(source_path)}
        with self.wh._lock:
            manifest = self._load()
            prev = manifest.get(name)
            gen = (prev.get("generation", 1) + 1) if prev else 1
            for comp, df in components.items():
                tbl = self._component_table(name, comp, gen)
                if partition_cols and comp in partition_cols:
                    self.wh.partition_cols[tbl] = partition_cols[comp]
                if cluster_by and comp in cluster_by:
                    from pyspark.sql import functions as F

                    keys = cluster_by[comp]
                    df = df.repartitionByRange(
                        cluster_files, *[F.col(k) for k in keys]
                    ).sortWithinPartitions(*keys)
                self.wh.replace_table(tbl, df)
            manifest = self._load()  # re-read: the writes may be slow
            manifest[name] = {
                "kind": kind,
                "components": sorted(components),
                "built_from": built,
                "params": params or {},
                "generation": gen,
            }
            self._save(manifest)  # THE commit point — atomic rename
            # prune generations older than the immediate predecessor
            # (kept one flip as in-flight reader grace)
            if prev:
                self._drop_generations(
                    name, prev["components"],
                    below=prev.get("generation", 1),
                )
        return manifest[name]

    def _drop_generations(
        self, name: str, components: list[str], below: int
    ) -> None:
        """Remove component tables of every generation < ``below``."""
        for g in range(max(1, below - 8), below):
            for comp in components:
                tbl = self._component_table(name, comp, g)
                if self.wh.table_exists(tbl):
                    self.wh.drop_table(tbl)

    def read(self, name: str) -> dict[str, "DataFrame"]:
        """Component DataFrames, keyed like they were registered — the
        shape the serving operators (bm25_search_indexed,
        ivf_search_indexed, pq_search, ...) take directly."""
        entry = self.describe(name)
        gen = entry.get("generation", 1)
        return {
            comp: self.wh.read(self._component_table(name, comp, gen))
            for comp in entry["components"]
        }

    def describe(self, name: str) -> dict:
        manifest = self._load()
        if name not in manifest:
            raise KeyError(
                f"no index {name!r} (registered: {sorted(manifest)})"
            )
        return manifest[name]

    def list_indexes(self) -> list[str]:
        return sorted(self._load())

    def drop(self, name: str) -> None:
        entry = self.describe(name)
        with self.wh._lock:
            gen = entry.get("generation", 1)
            self._drop_generations(name, entry["components"], below=gen + 1)
            manifest = self._load()
            manifest.pop(name, None)
            self._save(manifest)

    def component_table(self, name: str, component: str) -> str:
        """The CURRENT generation's warehouse table for a component —
        what an incremental maintainer writes into (insert_data a band
        batch, fold a bloom) before calling refresh_provenance. Raises
        if the component isn't part of the index."""
        entry = self.describe(name)
        if component not in entry["components"]:
            raise KeyError(
                f"index {name!r} has no component {component!r} "
                f"(components: {entry['components']})"
            )
        return self._component_table(name, component, entry.get("generation", 1))

    def refresh_provenance(self, name: str) -> dict:
        """Re-stamp ``built_from`` at the source's CURRENT state — for
        incrementally MAINTAINED indexes (bloom_union folds, band-history
        merges) where a batch is folded into the component tables and no
        full rebuild ever happens. The maintainer calls this after the
        fold; register() stays the full-rebuild path."""
        entry = self.describe(name)
        built = entry["built_from"]
        if "table" in built:
            built = {"table": built["table"],
                     "version": self.wh.table_versions(built["table"])[-1]}
        else:
            built = {"path": built["path"],
                     "fingerprint": _path_fingerprint(built["path"])}
        with self.wh._lock:
            manifest = self._load()
            manifest[name]["built_from"] = built
            self._save(manifest)
        return manifest[name]

    # ------------------------------------------------------------- staleness
    def staleness(self, name: str) -> dict:
        """The expect_fresh analogue for index artifacts: compare the
        recorded build provenance to the source's CURRENT state.

        Returns ``{stale, reason, built_from, current}`` — ``stale`` is
        True when the source advanced (newer data version / changed
        fingerprint) or disappeared. Never raises on a moved source:
        a gate must be able to REPORT a missing source, not crash."""
        entry = self.describe(name)
        built = entry["built_from"]
        if "table" in built:
            try:
                cur = self.wh.table_versions(built["table"])[-1]
            except Exception:
                return {"stale": True, "reason": "source table missing",
                        "built_from": built, "current": None}
            stale = cur != built["version"]
            return {
                "stale": stale,
                "reason": f"source at v{cur}, built from v{built['version']}"
                if stale else "fresh",
                "built_from": built,
                "current": {"table": built["table"], "version": cur},
            }
        try:
            cur_fp = _path_fingerprint(built["path"])
        except OSError:
            return {"stale": True, "reason": "source path missing",
                    "built_from": built, "current": None}
        stale = cur_fp != built["fingerprint"]
        return {
            "stale": stale,
            "reason": "source files changed" if stale else "fresh",
            "built_from": built,
            "current": {"path": built["path"], "fingerprint": cur_fp},
        }

    def is_stale(self, name: str) -> bool:
        return self.staleness(name)["stale"]

    def ensure_fresh(
        self,
        name: str,
        kind: str,
        build,
        **register_kwargs,
    ) -> bool:
        """Rebuild ``name`` iff it is missing or stale — the scheduling
        primitive the staleness flag exists for: a load's index-refresh
        page calls this once per index and pays the build only when the
        source actually moved (the MAX-watermark idea applied to whole
        artifacts). ``build`` is a zero-arg callable returning the
        component dict, invoked only when a rebuild is needed;
        ``register_kwargs`` are passed to :meth:`register` (source,
        partition/cluster layout, params). Returns True iff a rebuild
        ran."""
        try:
            if not self.is_stale(name):
                return False
        except KeyError:
            pass  # never registered — build it
        self.register(name, kind, build(), **register_kwargs)
        return True
