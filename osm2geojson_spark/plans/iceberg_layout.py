"""Iceberg-style table layout (SURVEY §7 risk 7 / VERDICT r1 №10).

The north rule names Iceberg as the checkpoint/lineage/metrics substrate;
this sandbox cannot fetch the Iceberg runtime jar (no network), so this
module implements the PROTOCOL Iceberg gets its guarantees from, over
plain parquet files and stdlib JSON — mirroring the real v2 spec's moving
parts so the swap to ``format("iceberg")`` is a writer change, not a
redesign:

- ``data/<commit-uuid>/…parquet``  — immutable data files, never listed;
- ``metadata/manifest-<uuid>.json`` — one manifest per commit: the data
  files it added, each with its partition values and row count;
- ``metadata/v<N>.metadata.json``  — full table metadata: schema, the
  snapshot log, and each snapshot's complete manifest list (previous
  manifests + the new one — snapshots are self-contained);
- ``metadata/version-hint.text``   — the single mutable pointer, swapped
  with ``os.replace`` (atomic on POSIX). THE commit is the hint swap.

Guarantees (same shape as real Iceberg):

- readers resolve hint → metadata → manifests → file list and never
  directory-list ``data/``, so a crash before the hint swap leaves any
  half-written files INVISIBLE (GC-able orphans), not half-visible rows;
- every commit is a snapshot: time-travel reads by snapshot id;
- partition values live in manifests, so "which buckets are committed"
  is a metadata-only read (no file listing, no lineage scan).

checkpoint.run_bucketed_stage(layout="iceberg") rides on this for
per-partition resume; tests inject crashes into the data-write→commit
window and assert no duplicate rows.
"""

from __future__ import annotations

import glob
import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession


class IcebergLikeTable:
    def __init__(self, root: str):
        self.root = root
        self.meta_dir = os.path.join(root, "metadata")

    # ------------------------------------------------------------- metadata
    def _hint_path(self) -> str:
        return os.path.join(self.meta_dir, "version-hint.text")

    def current_version(self) -> int:
        try:
            with open(self._hint_path()) as f:
                return int(f.read().strip())
        except FileNotFoundError:
            return 0

    def _metadata(self, version: int | None = None) -> dict | None:
        v = self.current_version() if version is None else version
        if v <= 0:
            return None
        with open(os.path.join(self.meta_dir, f"v{v}.metadata.json")) as f:
            return json.load(f)

    def snapshots(self) -> list[dict]:
        md = self._metadata()
        return md["snapshots"] if md else []

    def exists(self) -> bool:
        return self.current_version() > 0

    # ---------------------------------------------------------- file stats
    @staticmethod
    def _footer_stats(path: str, cols: list[str]) -> dict:
        """Per-file [min, max] per column, read from the parquet FOOTER
        (row-group statistics — no row scan, exactly the bounds real
        Iceberg manifests carry). Columns whose stats are missing in any
        row group are omitted (pruning then keeps the file: safe)."""
        import pyarrow.parquet as pq

        md = pq.ParquetFile(path).metadata
        if md.num_row_groups == 0:
            return {}
        name_to_idx = {md.row_group(0).column(i).path_in_schema: i
                       for i in range(md.row_group(0).num_columns)}
        out = {}
        for c in cols:
            i = name_to_idx.get(c)
            if i is None:
                continue
            mins, maxs = [], []
            for rg in range(md.num_row_groups):
                s = md.row_group(rg).column(i).statistics
                if s is None or not s.has_min_max:
                    mins = []
                    break
                mins.append(s.min)
                maxs.append(s.max)
            if mins:
                out[c] = [min(mins), max(maxs)]
        return out

    # --------------------------------------------------------------- commit
    def append(
        self,
        df: DataFrame,
        partition_by: str | None = None,
        summary: dict | None = None,
        overwrite: bool = False,
        stats_cols: list[str] | None = None,
    ) -> dict:
        """Write ``df`` as a new snapshot. With ``partition_by``, data
        files land under ``<col>=<val>`` dirs and each manifest entry
        records its partition value (metadata-only partition pruning).
        Returns the new snapshot dict. The commit point is the atomic
        version-hint swap at the very end — everything before it is
        invisible to readers.

        ``overwrite=True`` makes this a REPLACE commit: the new
        snapshot's manifest list contains only this write (previous
        snapshots stay readable via time travel until expired) — the
        building block for compaction."""
        os.makedirs(self.meta_dir, exist_ok=True)
        commit_id = uuid.uuid4().hex[:12]
        data_dir = os.path.join(self.root, "data", commit_id)
        w = df.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(partition_by)
        w.parquet(data_dir)

        entries = []
        pattern = (os.path.join(data_dir, f"{partition_by}=*", "*.parquet")
                   if partition_by else os.path.join(data_dir, "*.parquet"))
        for p in sorted(glob.glob(pattern)):
            part = {}
            if partition_by:
                kv = os.path.basename(os.path.dirname(p))
                col, _, val = kv.partition("=")
                part[col] = val
            e = {"path": os.path.relpath(p, self.root), "partition": part}
            if stats_cols:
                e["stats"] = self._footer_stats(p, stats_cols)
            entries.append(e)
        manifest_name = f"manifest-{commit_id}.json"
        with open(os.path.join(self.meta_dir, manifest_name), "w") as f:
            json.dump({"entries": entries}, f)

        return self._commit_snapshot(
            manifest_name, len(entries), summary, overwrite,
            json.loads(df.schema.json()), partition_by, commit_id)

    def _commit_snapshot(self, manifest_name: str, added: int,
                         summary: dict | None, overwrite: bool,
                         schema_json: dict, partition_by: str | None,
                         commit_id: str) -> dict:
        # optimistic concurrency (ADVICE round-2 fix): the metadata file
        # is created with O_EXCL, so two writers racing to the same
        # version N cannot both succeed — the loser re-reads the winner's
        # metadata and rebases its snapshot on top (real Iceberg's
        # rename-without-overwrite + retry, spelled in posix). A v{N}
        # file with no hint pointing at it is a crashed commit's orphan:
        # the prober skips past it (monotonic v) while STILL rebasing on
        # the committed metadata only, so the orphan snapshot is
        # abandoned, never resurrected.
        v = 0
        for _attempt in range(20):
            prev = self._metadata()
            prev_manifests = [] if overwrite else (
                prev["snapshots"][-1]["manifests"] if prev and
                prev["snapshots"] else [])
            snap = {
                "snapshot_id": (prev["snapshots"][-1]["snapshot_id"] + 1
                                if prev and prev["snapshots"] else 1),
                "manifests": prev_manifests + [manifest_name],
                "added_files": added,
                "timestamp": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
                "summary": summary or {},
            }
            new_md = {
                "format_version": 2,
                "table_uuid": prev["table_uuid"] if prev else uuid.uuid4().hex,
                "location": self.root,
                "schema": schema_json,
                "partition_by": partition_by,
                "snapshots": (prev["snapshots"] if prev else []) + [snap],
            }
            v = max(v + 1, self.current_version() + 1)
            try:
                with open(os.path.join(self.meta_dir,
                                       f"v{v}.metadata.json"), "x") as f:
                    json.dump(new_md, f)
            except FileExistsError:
                continue  # lost the race for version v — rebase and retry
            tmp = self._hint_path() + f".tmp-{commit_id}"
            with open(tmp, "w") as f:
                f.write(str(v))
            os.replace(tmp, self._hint_path())  # ← THE commit
            return snap
        raise RuntimeError(
            f"commit contention: lost the version race 20 times in "
            f"{self.meta_dir}")

    # ---------------------------------------------------------------- reads
    def _snapshot(self, snapshot_id: int | None = None) -> dict | None:
        md = self._metadata()
        if not md or not md["snapshots"]:
            return None
        snaps = md["snapshots"]
        return (snaps[-1] if snapshot_id is None else
                next(s for s in snaps if s["snapshot_id"] == snapshot_id))

    def _entries(self, snapshot_id: int | None = None,
                 content: str | None = "data") -> list[dict]:
        """Manifest entries of a snapshot; ``content`` filters by entry
        kind ('data' / 'equality-deletes' / None = all). Entries without
        a content field are data (pre-MOR manifests)."""
        snap = self._snapshot(snapshot_id)
        if snap is None:
            return []
        entries = []
        for mf in snap["manifests"]:
            with open(os.path.join(self.meta_dir, mf)) as f:
                entries.extend(json.load(f)["entries"])
        if content is not None:
            entries = [e for e in entries
                       if e.get("content", "data") == content]
        return entries

    def _entry_seqs(self, snapshot_id: int | None = None) -> dict[str, int]:
        """path → sequence number. A manifest's sequence is the id of
        the FIRST snapshot that included it (Iceberg's data sequence
        numbers, derived instead of stored — writers stay unchanged):
        equality deletes apply only to rows whose file sequence is
        strictly older than the delete's."""
        md = self._metadata()
        snap = self._snapshot(snapshot_id)
        if snap is None:
            return {}
        first_seen: dict[str, int] = {}
        for s in md["snapshots"]:
            for mf in s["manifests"]:
                first_seen.setdefault(mf, s["snapshot_id"])
        seqs: dict[str, int] = {}
        for mf in snap["manifests"]:
            with open(os.path.join(self.meta_dir, mf)) as f:
                for e in json.load(f)["entries"]:
                    seqs[e["path"]] = first_seen[mf]
        return seqs

    def _delete_specs(self, snapshot_id: int | None = None) \
            -> list[tuple[str, str, int]]:
        """Outstanding equality-delete files: [(key_col, abs_path, seq)]."""
        seqs = self._entry_seqs(snapshot_id)
        return [(e["key"], os.path.join(self.root, e["path"]),
                 seqs[e["path"]])
                for e in self._entries(snapshot_id, "equality-deletes")]

    def _files(self, snapshot_id: int | None = None) -> list[str]:
        return [os.path.join(self.root, e["path"])
                for e in self._entries(snapshot_id)]

    def plan_files(self, prune: dict | None = None,
                   snapshot_id: int | None = None) -> tuple[list[str], int]:
        """Metadata-only scan planning: ``prune`` maps column → (lo, hi)
        inclusive interval; a file is kept unless its manifest stats
        prove it disjoint from EVERY predicate interval. Files without
        stats for a predicated column are kept (pruning is a superset —
        callers still apply the row filter). Returns (kept, total) so
        benchmarks can report the skipping ratio."""
        entries = self._entries(snapshot_id)
        if not prune:
            return [os.path.join(self.root, e["path"]) for e in entries], \
                len(entries)
        kept = []
        for e in entries:
            stats = e.get("stats") or {}
            drop = False
            for col, (lo, hi) in prune.items():
                if col in stats:
                    fmin, fmax = stats[col]
                    if fmax < lo or fmin > hi:
                        drop = True
                        break
            if not drop:
                kept.append(os.path.join(self.root, e["path"]))
        return kept, len(entries)

    def read(self, spark: SparkSession,
             snapshot_id: int | None = None,
             prune: dict | None = None) -> DataFrame:
        """Current (or time-travel) snapshot as a DataFrame. Partition
        columns are reconstructed per commit directory via basePath
        (files are grouped by their commit dir — a commit is one write,
        so each group has a consistent <col>=<val> layout).

        ``prune``: interval predicates ({col: (lo, hi)}) resolved
        against per-file manifest stats BEFORE Spark ever sees a path —
        the scan plan contains only surviving files. The pruned set is a
        superset of matching rows; apply the row filter on the result."""
        files = (self.plan_files(prune, snapshot_id)[0] if prune
                 else self._files(snapshot_id))
        if not files:
            if prune and self._files(snapshot_id):
                # every file pruned — legit empty result, table schema
                from pyspark.sql.types import StructType

                schema = StructType.fromJson(self._metadata()["schema"])
                return spark.createDataFrame([], schema)
            raise FileNotFoundError(f"no committed snapshot in {self.root}")
        specs = self._delete_specs(snapshot_id)
        if not specs:
            return self._read_paths(spark, files)
        # merge-on-read: group data files by sequence number; each
        # equality-delete spec anti-joins only the groups strictly older
        # than it (a key re-added after the delete survives)
        seqs = self._entry_seqs(snapshot_id)
        by_seq: dict[int, list[str]] = {}
        for p in files:
            by_seq.setdefault(seqs[os.path.relpath(p, self.root)], []) \
                .append(p)
        out = None
        for gseq, fs in sorted(by_seq.items()):
            d = self._read_paths(spark, fs)
            for key, dpath, dseq in specs:
                if dseq > gseq:
                    keys = spark.read.parquet(dpath).select(key).distinct()
                    d = d.join(keys, key, "left_anti")
            out = d if out is None else out.unionByName(d)
        return out

    def _read_paths(self, spark: SparkSession, files: list[str]) -> DataFrame:
        by_commit: dict[str, list[str]] = {}
        for p in files:
            rel = os.path.relpath(p, self.root).split(os.sep)
            base = os.path.join(self.root, rel[0], rel[1])
            by_commit.setdefault(base, []).append(p)
        out = None
        for base, fs in sorted(by_commit.items()):
            d = spark.read.option("basePath", base).parquet(*fs)
            out = d if out is None else out.unionByName(d)
        return out

    # ------------------------------------------------------------ maintenance
    def compact(self, spark: SparkSession,
                files_per_partition: int = 1) -> dict:
        """Small-file compaction — at 100 TB, per-wave appends accumulate
        thousands of files per partition and scan planning degrades.
        Rewrites the CURRENT snapshot into ``files_per_partition`` files
        per partition value as a single REPLACE commit (atomic hint
        swap; readers see old-or-new, never a mix; prior snapshots stay
        time-travelable until expire_snapshots GCs them).
        Returns {files_before, files_after}."""
        before = len(self._files())
        md = self._metadata()
        part = md.get("partition_by") if md else None
        df = self.read(spark)
        if part:
            df = df.repartition(files_per_partition, part)
        else:
            df = df.coalesce(files_per_partition)
        self.append(df, partition_by=part,
                    summary={"operation": "compact"}, overwrite=True)
        return {"files_before": before, "files_after": len(self._files())}

    def cluster(self, spark: SparkSession, lon_col: str, lat_col: str,
                n_files: int = 8,
                stats_cols: list[str] | None = None) -> dict:
        """Hilbert-curve data clustering (the "zorder by" maintenance op,
        with a better curve): REPLACE-commit the current snapshot sorted
        by the S2 leaf id of (lon, lat) into ``n_files`` range-partitioned
        files, recording per-file lon/lat footer bounds in the manifest.

        Why this matters at 100 TB: after clustering, each file covers a
        CONTIGUOUS Hilbert range, and the Hilbert curve has no seams —
        so per-file lon/lat bounding boxes are tight, and a spatial
        interval predicate prunes all but O(query-area / file-area)
        files at PLAN time (plan_files), before Spark lists a single
        path. Unclustered appends leave every file spanning the whole
        domain: zero skipping. tests/test_iceberg_cluster.py measures
        the ratio; BENCH.md records it.

        The sort is one repartitionByRange exchange (range boundaries
        from Spark's sampled partitioner) + in-partition sort — the same
        cost shape as any global sort, amortized over every subsequent
        pruned scan. Returns {files_before, files_after, stats_cols}."""
        from pyspark.sql import functions as F

        from osm2geojson_spark.functions.s2 import s2_udf

        before = len(self._files())
        stats_cols = list(dict.fromkeys(
            [lon_col, lat_col] + list(stats_cols or [])))
        df = self.read(spark)
        enc = s2_udf(level=30)
        key = enc(F.col(lon_col), F.col(lat_col))
        clustered = (df.withColumn("__hilbert", key)
                     .repartitionByRange(n_files, "__hilbert")
                     .sortWithinPartitions("__hilbert")
                     .drop("__hilbert"))
        self.append(clustered, summary={"operation": "cluster",
                                        "curve": "s2-hilbert"},
                    overwrite=True, stats_cols=stats_cols)
        return {"files_before": before, "files_after": len(self._files()),
                "stats_cols": stats_cols}

    def delete_keys(self, spark: SparkSession, keys: DataFrame,
                    key_col: str) -> dict:
        """Merge-on-read EQUALITY DELETE (Iceberg v2 delete files): the
        keys land as a tiny parquet + an `equality-deletes` manifest
        entry — NO data file is read, rewritten, or moved; the delete is
        metadata-speed regardless of table size. Readers anti-join
        delete keys against data files with an OLDER sequence number
        (so re-appending a deleted key later works, per the v2 spec),
        and ``compact()`` materializes outstanding deletes away.

        The COW/MOR split this completes: `upsert` pays the rewrite at
        write time (read-optimized), `delete_keys` defers it to read
        time (write-optimized) — the same trade real Iceberg exposes
        per-operation. Returns {keys_deleted}."""
        md = self._metadata()
        if not md:
            raise FileNotFoundError(f"no committed snapshot in {self.root}")
        commit_id = uuid.uuid4().hex[:12]
        data_dir = os.path.join(self.root, "data", commit_id)
        dk = keys.select(key_col).distinct()
        n = dk.count()
        dk.coalesce(1).write.mode("overwrite").parquet(data_dir)
        entries = [{"path": os.path.relpath(p, self.root), "partition": {},
                    "content": "equality-deletes", "key": key_col}
                   for p in sorted(glob.glob(
                       os.path.join(data_dir, "*.parquet")))]
        manifest_name = f"manifest-{commit_id}.json"
        with open(os.path.join(self.meta_dir, manifest_name), "w") as f:
            json.dump({"entries": entries}, f)
        self._commit_snapshot(
            manifest_name, 0,
            {"operation": "delete", "keys_deleted": n},
            False, md["schema"], md.get("partition_by"), commit_id)
        return {"keys_deleted": n}

    def upsert(self, spark: SparkSession, updates: DataFrame,
               key_col: str, stats_cols: list[str] | None = None) -> dict:
        """Copy-on-write MERGE by key (Iceberg v2 `MERGE INTO` COW
        strategy): rows in ``updates`` replace same-key rows; new keys
        insert. Only data files whose manifest ``key_col`` range could
        contain an updated key are rewritten — every other file carries
        over into the new snapshot BY REFERENCE (its manifest entry is
        copied, the parquet bytes are never read or moved). One atomic
        REPLACE commit: readers see the whole merge or none of it, and
        prior snapshots stay time-travelable.

        Why this is the 100 TB shape: a day's corrections touch a few
        keys; with clustered files + footer stats the rewrite set is
        O(files overlapping the update keys), not O(table). The affected
        test is metadata × a broadcast of per-file ranges against the
        updates — one tiny Spark job whose result is a per-file boolean,
        O(files) to the driver, never row data. Files with no recorded
        ``key_col`` stats are conservatively rewritten (superset-safe,
        same rule as plan_files).

        Returns {files_rewritten, files_carried, rows_upserted}."""
        from pyspark.sql import functions as F

        md = self._metadata()
        if md and md.get("partition_by"):
            raise ValueError("upsert supports unpartitioned tables; "
                             "compact/cluster first")
        if self._delete_specs():
            # carried-by-reference files would jump to the merge commit's
            # sequence and escape older equality deletes — materialize
            # them first
            raise ValueError("outstanding equality deletes; compact() "
                             "before upsert")
        entries = self._entries()
        ranged = [(i, e["stats"][key_col][0], e["stats"][key_col][1])
                  for i, e in enumerate(entries)
                  if key_col in (e.get("stats") or {})]
        affected_idx = {i for i, e in enumerate(entries)
                        if key_col not in (e.get("stats") or {})}
        if ranged:
            rng = spark.createDataFrame(
                ranged, f"idx int, lo {updates.schema[key_col].dataType.simpleString()}, "
                        f"hi {updates.schema[key_col].dataType.simpleString()}")
            hit = (updates.select(F.col(key_col).alias("k")).distinct()
                   .join(F.broadcast(rng),
                         (F.col("k") >= F.col("lo")) & (F.col("k") <= F.col("hi")))
                   .select("idx").distinct().collect())
            affected_idx |= {r["idx"] for r in hit}

        rewrite = [os.path.join(self.root, entries[i]["path"])
                   for i in sorted(affected_idx)]
        carried = [e for i, e in enumerate(entries) if i not in affected_idx]

        stats_cols = list(dict.fromkeys([key_col] + list(stats_cols or [])))
        commit_id = uuid.uuid4().hex[:12]
        data_dir = os.path.join(self.root, "data", commit_id)
        merged = updates
        if rewrite:
            kept_rows = self._read_paths(spark, rewrite).join(
                updates.select(key_col), key_col, "left_anti")
            merged = kept_rows.unionByName(updates)
        merged.write.mode("overwrite").parquet(data_dir)

        new_entries = []
        for p in sorted(glob.glob(os.path.join(data_dir, "*.parquet"))):
            new_entries.append({
                "path": os.path.relpath(p, self.root), "partition": {},
                "stats": self._footer_stats(p, stats_cols)})
        manifest_name = f"manifest-{commit_id}.json"
        with open(os.path.join(self.meta_dir, manifest_name), "w") as f:
            json.dump({"entries": carried + new_entries}, f)
        n_up = updates.count()
        self._commit_snapshot(
            manifest_name, len(new_entries),
            {"operation": "upsert", "files_rewritten": len(rewrite),
             "files_carried": len(carried)},
            True, json.loads(merged.schema.json()), None, commit_id)
        return {"files_rewritten": len(rewrite),
                "files_carried": len(carried), "rows_upserted": n_up}

    def expire_snapshots(self, keep_last: int = 1,
                         orphan_grace_sec: float = 3600.0) -> dict:
        """Iceberg-style table maintenance: drop all but the newest
        ``keep_last`` snapshots from metadata, then garbage-collect every
        data file and manifest no surviving snapshot references —
        including ORPHANS from crashed commits (written but never made
        visible by a hint swap). The metadata rewrite commits through the
        same atomic hint-swap O_EXCL path as append, so a reader never
        observes a half-expired table. Returns {files_removed,
        manifests_removed, snapshots_removed}.

        ``orphan_grace_sec`` (ADVICE round-2 fix): an IN-FLIGHT writer's
        data files look exactly like crash orphans until its hint swap
        lands, so unreferenced files younger than the grace window are
        left alone — only stale orphans are collected. Set 0 only when
        no concurrent writer can exist (tests, single-writer cron)."""
        md = self._metadata()
        if not md or not md["snapshots"]:
            return {"files_removed": 0, "manifests_removed": 0,
                    "snapshots_removed": 0}
        kept = md["snapshots"][-max(1, keep_last):]
        removed_snaps = len(md["snapshots"]) - len(kept)
        live_manifests = {m for s in kept for m in s["manifests"]}
        live_files = set()
        for mf in live_manifests:
            with open(os.path.join(self.meta_dir, mf)) as f:
                live_files.update(e["path"] for e in json.load(f)["entries"])
        # GC: anything under data/ not referenced by a live manifest and
        # older than the in-flight-writer grace window
        now = time.time()
        files_removed = 0
        for p in glob.glob(os.path.join(self.root, "data", "*", "**", "*"),
                           recursive=True):
            if os.path.isfile(p) and \
                    os.path.relpath(p, self.root) not in live_files and \
                    now - os.path.getmtime(p) >= orphan_grace_sec:
                os.remove(p)
                files_removed += 1
        manifests_removed = 0
        for p in glob.glob(os.path.join(self.meta_dir, "manifest-*.json")):
            if os.path.basename(p) not in live_manifests and \
                    now - os.path.getmtime(p) >= orphan_grace_sec:
                os.remove(p)
                manifests_removed += 1
        v = 0
        for _attempt in range(20):
            v = max(v + 1, self.current_version() + 1)
            cur = self._metadata()
            new_md = dict(cur, snapshots=[
                s for s in cur["snapshots"]
                if s["snapshot_id"] in {k["snapshot_id"] for k in kept}
                or s["snapshot_id"] > md["snapshots"][-1]["snapshot_id"]])
            try:
                with open(os.path.join(self.meta_dir,
                                       f"v{v}.metadata.json"), "x") as f:
                    json.dump(new_md, f)
            except FileExistsError:
                continue  # concurrent append won the version — rebase
            tmp = self._hint_path() + ".tmp-expire"
            with open(tmp, "w") as f:
                f.write(str(v))
            os.replace(tmp, self._hint_path())
            return {"files_removed": files_removed,
                    "manifests_removed": manifests_removed,
                    "snapshots_removed": removed_snaps}
        raise RuntimeError("expire_snapshots: lost the version race 20 times")

    def partitions(self, snapshot_id: int | None = None) -> set[tuple]:
        """Committed partition values — metadata-only (no data IO)."""
        md = self._metadata()
        if not md or not md["snapshots"]:
            return set()
        snaps = md["snapshots"]
        snap = (snaps[-1] if snapshot_id is None else
                next(s for s in snaps if s["snapshot_id"] == snapshot_id))
        out: set[tuple] = set()
        for mf in snap["manifests"]:
            with open(os.path.join(self.meta_dir, mf)) as f:
                for e in json.load(f)["entries"]:
                    if e["partition"]:
                        out.add(tuple(sorted(e["partition"].items())))
        return out

    def snapshot_diff(self, spark: SparkSession, from_id: int,
                      to_id: int, key_col: str) -> dict:
        """CDC changelog between two snapshots (real Iceberg's
        ``create_changelog_view``): what a downstream consumer must
        apply to move from ``from_id`` to ``to_id``.

        Returns {"added", "removed", "changed"} DataFrames — added/
        removed carry the to-/from-side rows; changed carries the
        to-side row plus every non-key column's before-image as
        ``<col>_before`` (null-safe comparison, so NULL→value and
        value→NULL count as changes).

        Scale shape: two key-partitioned anti-joins + one inner join —
        all on the same key, one partitioning reused; nothing is
        collected. Time-travel reads resolve from manifests, so the diff
        scans only the two snapshots' live files (MOR deletes applied
        per read)."""
        from functools import reduce

        from pyspark.sql import functions as F

        a = self.read(spark, snapshot_id=from_id)
        b = self.read(spark, snapshot_id=to_id)
        added = b.join(a.select(key_col), key_col, "left_anti")
        removed = a.join(b.select(key_col), key_col, "left_anti")
        val_cols = [c for c in b.columns if c != key_col]
        before = a.select(
            key_col, *[F.col(c).alias(f"{c}_before") for c in val_cols])
        joined = b.join(before, key_col)
        neq = reduce(
            lambda x, y: x | y,
            [~F.col(c).eqNullSafe(F.col(f"{c}_before"))
             for c in val_cols])
        return {"added": added, "removed": removed,
                "changed": joined.where(neq)}


def plan_compaction_groups(files: DataFrame, target_bytes: int,
                           part_col: str = "part",
                           file_col: str = "file",
                           size_col: str = "bytes") -> DataFrame:
    """Size-aware small-file compaction planning (the RewriteDataFiles
    binPack planner shape) over ANY ``(partition, file, bytes)``
    listing — including this module's manifest entries: files are
    ordered deterministically within each partition, and a file joins
    the rewrite group its cumulative START OFFSET falls into
    (``offset div target_bytes`` — the offset-bucketing rule: every
    group's input is ≤ target_bytes + one straddling file, and the
    grouping is pure window algebra, no sequential driver state).
    Returns ``(part, group_id, n_files, group_bytes, files)``;
    singleton groups at target size are no-op rewrites the executor
    skips. One partition-keyed window + one groupBy — both on the
    METADATA-sized manifest, never the data."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    t = int(target_bytes)
    if t <= 0:
        raise ValueError("target_bytes must be positive")
    staged = files.select(
        F.col(part_col).alias("part"),
        F.col(file_col).alias("file"),
        F.col(size_col).cast("long").alias("bytes")) \
        .withColumn("off", F.sum("bytes").over(
            W.partitionBy("part").orderBy("file")
            .rowsBetween(W.unboundedPreceding, 0)) - F.col("bytes"))
    return (staged
            .select("part", "file", "bytes",
                    F.expr(f"off div {t}").alias("group_id"))
            .groupBy("part", "group_id")
            .agg(F.count("*").alias("n_files"),
                 F.sum("bytes").alias("group_bytes"),
                 F.sort_array(F.collect_list("file")).alias("files")))
