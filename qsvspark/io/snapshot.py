"""Snapshot catalog: Iceberg-style table snapshots with lineage manifests.

No Iceberg runtime jars exist in this sandbox (verified — BASELINE.md §3),
so the catalog emulates the parts the pipeline needs on plain Parquet:

  root/
    <table>/
      snap-00001/
        data/ ...parquet parts (optionally partitioned by a key column)
        manifest.json       — schema, row counts (total + per partition),
                              lineage (input snapshot ids + op description),
                              input fingerprint, metrics, committed flag
      snap-00002/ ...
      CURRENT                — name of the latest committed snapshot

A write is atomic-by-rename semantics: data lands under a snap dir, the
manifest is written last with committed=true, and CURRENT flips only then
— a killed run leaves either no snap or an uncommitted one, and resume
(``find_committed``) keys on the input fingerprint, so committed stages
are never recomputed. On a real cluster the same interface binds to
Iceberg (`writeTo(...).createOrReplace()` + snapshot metadata); the
emulation keeps resume logic testable locally.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import urllib.parse

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _footer_partition_counts(data_dir: str, key: str) -> dict:
    """Per-partition row counts from parquet FOOTERS only — zero data
    pages read, no extra Spark job. This mirrors how Iceberg manifests
    account rows (per-file record counts captured at commit time); the
    local-FS walk is the emulation-layer equivalent of reading the
    manifest file list."""
    import pyarrow.parquet as pq

    counts: dict = {}
    if not os.path.isdir(data_dir):
        return counts
    for entry in sorted(os.listdir(data_dir)):
        if not entry.startswith(f"{key}="):
            continue
        val = urllib.parse.unquote(entry.split("=", 1)[1])
        n = 0
        for root, _, files in os.walk(os.path.join(data_dir, entry)):
            for fn in files:
                if fn.endswith(".parquet"):
                    n += pq.ParquetFile(os.path.join(root, fn)).metadata.num_rows
        counts[val] = n
    return counts


def _json_scalar(v):
    """Parquet footer statistics value → JSON-serializable scalar, or None
    when the type has no meaningful file-pruning order (we then skip the
    stat rather than store something uncomparable)."""
    if isinstance(v, bool) or v is None:
        return None
    if isinstance(v, (int, float, str)):
        return v
    if isinstance(v, bytes):
        try:
            return v.decode("utf-8")
        except UnicodeDecodeError:
            return None
    return None


def _footer_file_stats(data_dir: str, cols: list[str]) -> list[dict]:
    """Per-file min/max for ``cols`` plus row/byte counts, from parquet
    FOOTERS only (no data pages). This is the per-file column-stats record
    an Iceberg manifest carries (lower_bounds/upper_bounds per data file);
    scan planning prunes on it before Spark ever lists the files."""
    import pyarrow.parquet as pq

    out: list[dict] = []
    want = set(cols or [])
    for root, _, files in os.walk(data_dir):
        for fn in sorted(files):
            if not fn.endswith(".parquet"):
                continue
            path = os.path.join(root, fn)
            rel_dir = os.path.relpath(root, data_dir)
            part = None
            if rel_dir != "." and "=" in rel_dir:
                part = urllib.parse.unquote(rel_dir.split("=", 1)[1])
            md = pq.ParquetFile(path).metadata
            stats: dict[str, list] = {}
            complete: dict[str, bool] = {}
            for rg in range(md.num_row_groups):
                g = md.row_group(rg)
                for ci in range(g.num_columns):
                    c = g.column(ci)
                    name = c.path_in_schema.split(".")[0]
                    if name not in want:
                        continue
                    s = c.statistics
                    if s is None or not s.has_min_max:
                        complete[name] = False
                        continue
                    mn, mx = _json_scalar(s.min), _json_scalar(s.max)
                    if mn is None or mx is None:
                        complete[name] = False
                        continue
                    complete.setdefault(name, True)
                    if name in stats:
                        stats[name][0] = min(stats[name][0], mn)
                        stats[name][1] = max(stats[name][1], mx)
                    else:
                        stats[name] = [mn, mx]
            # a column whose stats any row group lacked can't prune safely
            stats = {k: v for k, v in stats.items() if complete.get(k)}
            out.append(
                {
                    "path": os.path.relpath(path, data_dir),
                    "bytes": os.path.getsize(path),
                    "rows": md.num_rows,
                    "partition": part,
                    "stats": stats,
                }
            )
    return out


def _zorder_expr(cols_ranges: list[tuple[str, float, float]],
                 bits_total: int = 63):
    """Z-order (Morton) value over numeric columns: each column is scaled
    into its share of ``bits_total`` bits using the GIVEN min/max range
    (no data pass here), then the bits are interleaved — a single
    codegen'd expression tree of shifts/ands/ors. Rows close in z are
    close in EVERY dimension, so range-partitioning + sorting by z gives
    files whose min/max stats are tight on every z column at once —
    multi-column file pruning, where a linear sort only serves its
    leading column.

    bits_total defaults to 63 (not 64) so the highest interleaved bit
    position is ≤62 and z stays non-negative — position 63 is the long
    sign bit, and a sign flip would sort the upper half of the last
    column's range BEFORE everything else, splitting the curve. Per-column
    bits are additionally capped at 52 so ``top`` is exactly representable
    as a double (the scaling arithmetic is double-precision); without the
    cap a single-column call would compute top = 2^63-1, which rounds to
    2^63 as a double and saturates the long cast, collapsing the top of
    the range to one z value."""
    n = len(cols_ranges)
    bits = max(1, min(bits_total // n, 52))
    top = float(2**bits - 1)
    us = []
    for c, mn, mx in cols_ranges:
        span = float(mx) - float(mn)
        if span <= 0:
            us.append(F.lit(0).cast("long"))
            continue
        scaled = (F.col(c).cast("double") - F.lit(float(mn))) / F.lit(span) * F.lit(top)
        us.append(F.least(F.greatest(scaled, F.lit(0.0)), F.lit(top)).cast("long"))
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, u in enumerate(us):
            z = z.bitwiseOR(
                F.shiftleft(F.shiftright(u, i).bitwiseAND(F.lit(1)), i * n + j)
            )
    return z


# Delete-key sets are broadcast to every task while they are small (the
# common takedown case: a key file of doc ids), but takedowns accumulate
# without bound; past this many bytes of ESTIMATED IN-MEMORY relation
# (footer uncompressed stats + per-row overhead — see
# _broadcast_estimate_bytes; at-rest snappy bytes understate highly
# compressible keys by 10x+) the reader falls back to a shuffled
# anti-join rather than risk executor/driver memory on an ever-growing
# broadcast. (Iceberg bounds delete application per data file via its
# manifests; this is the emulation-layer equivalent bound.)
_DELETE_BROADCAST_MAX_BYTES = 32 * 1024 * 1024


def _dir_bytes(*dirs: str) -> int:
    """Total bytes of parquet data under the given directories — file
    sizes only, no reads; used to size-gate broadcasts."""
    total = 0
    for d in dirs:
        for root, _, files in os.walk(d):
            for fn in files:
                if fn.endswith(".parquet"):
                    total += os.path.getsize(os.path.join(root, fn))
    return total


def _broadcast_estimate_bytes(*dirs: str) -> int:
    """Estimated IN-MEMORY size of the broadcast relation built from the
    parquet under ``dirs``. At-rest snappy bytes understate the hazard —
    32 MB of highly-compressible key parquet can decompress to hundreds
    of MB of broadcast relation — so this reads only the FOOTERS
    (metadata, not data) and sums each column chunk's
    total_uncompressed_size, plus a per-row overhead for the hash
    relation (key hash + offsets + UnsafeRow header). Falls back to
    3x the at-rest bytes when footer stats are unreadable."""
    try:
        import pyarrow.parquet as pq

        total = 0
        rows = 0
        for d in dirs:
            for root, _, files in os.walk(d):
                for fn in files:
                    if not fn.endswith(".parquet"):
                        continue
                    md = pq.ParquetFile(os.path.join(root, fn)).metadata
                    rows += md.num_rows
                    for rg in range(md.num_row_groups):
                        g = md.row_group(rg)
                        for c in range(g.num_columns):
                            total += g.column(c).total_uncompressed_size
        return total + rows * 32
    except Exception:  # noqa: BLE001 — a sizing estimate must never fail the op
        return 3 * _dir_bytes(*dirs)


class SnapshotCatalog:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    # -- paths ------------------------------------------------------

    def _table_dir(self, table: str) -> str:
        return os.path.join(self.root, table)

    def _snaps(self, table: str) -> list[str]:
        d = self._table_dir(table)
        if not os.path.isdir(d):
            return []
        return sorted(s for s in os.listdir(d) if s.startswith("snap-"))

    def current_snapshot(self, table: str) -> str | None:
        cur = os.path.join(self._table_dir(table), "CURRENT")
        if os.path.exists(cur):
            with open(cur) as f:
                return f.read().strip()
        return None

    def manifest(self, table: str, snap: str | None = None) -> dict | None:
        snap = self._resolve_ref(table, snap) or self.current_snapshot(table)
        if snap is None:
            return None
        mpath = os.path.join(self._table_dir(table), snap, "manifest.json")
        if not os.path.exists(mpath):
            return None
        with open(mpath) as f:
            return json.load(f)

    def file_stats(self, table: str, snap: str | None = None) -> list[dict] | None:
        """Load a snapshot's per-file column-stats sidecar (the
        manifest-file level of Iceberg's two-level metadata). Returns None
        when the snapshot recorded no stats (no stats_by/cluster_by).
        Reads back legacy manifests that inlined ``file_stats``."""
        snap = self._resolve_ref(table, snap) or self.current_snapshot(table)
        if snap is None:
            return None
        m = self.manifest(table, snap)
        if m is None:
            return None
        if m.get("file_stats") is not None:
            return m["file_stats"]
        rel = m.get("file_stats_file")
        if not rel:
            return None
        path = os.path.join(self._table_dir(table), snap, rel)
        if not os.path.exists(path):
            return None
        with open(path) as f:
            return json.load(f)

    # -- resume -----------------------------------------------------

    def find_committed(self, table: str, input_fingerprint: str) -> str | None:
        """Return the snapshot id of a committed snapshot produced from the
        same inputs, or None. This is the resume check: a killed run calls
        this per stage and skips stages whose fingerprint already landed."""
        for snap in reversed(self._snaps(table)):
            m = self.manifest(table, snap)
            if (
                m
                and m.get("committed")
                and not m.get("staged")
                and m.get("input_fingerprint") == input_fingerprint
            ):
                return snap
        return None

    # -- write ------------------------------------------------------

    def write(
        self,
        df: DataFrame,
        table: str,
        *,
        input_fingerprint: str = "",
        lineage: dict | None = None,
        partition_by: str | None = None,
        count_by: str | None = None,
        compression: str = "snappy",
        cluster_by: list[str] | None = None,
        parent: str | None = None,
        stats_by: list[str] | None = None,
        bucket_by: list[str] | None = None,
        n_buckets: int = 0,
        replace_partitions: list[str] | None = None,
        staged: bool = False,
    ) -> dict:
        """Write df as the next snapshot of ``table`` and commit a manifest.

        parent: chain this snapshot onto an existing one (Iceberg APPEND
        semantics): the new snapshot's data dir holds ONLY the delta rows;
        reads resolve the parent chain. The manifest keeps the delta's
        row_count/partition_counts plus running ``cumulative_*`` totals,
        so per-partition accounting stays one manifest read deep.

        count_by: a column whose per-value row counts go in the manifest
        (the per-partition lineage/metrics the north rule requires).
        Accounting never re-reads the written data: the total row count
        is an ``Observation`` metric collected DURING the write job, and
        per-partition counts come from parquet footers (when partitioned
        by the count key) or one column-pruned aggregate otherwise.

        cluster_by: sort each write task's rows by these columns before
        encoding (Iceberg's sort-order data layout). Narrow (no shuffle)
        — the point is parquet min/max locality: row groups inside each
        file cover disjoint ranges of the cluster columns, so downstream
        point/range filters prune row groups instead of scanning them.

        stats_by: columns whose per-FILE min/max go into the manifest
        (Iceberg lower_bounds/upper_bounds) for ``scan()``-time file
        pruning; defaults to cluster_by. Footer reads only — no data
        pages, no extra Spark job.

        bucket_by/n_buckets: hash-bucket layout (Iceberg's ``bucket(N,
        col)`` partition transform, realized through Spark's native
        bucketed writer). The point at 10^12-row scale: a table written
        bucketed on its join key is NEVER reshuffled by later joins on
        that key — the scan itself reports hash partitioning, so only
        the other (small, incremental) side pays an Exchange. This is
        how the ever-growing dedup-keys chain stays join-cheap: the
        multi-TB committed key set sits bucketed at rest while each
        increment shuffles only its own delta keys into the same
        bucketing. Bucketed snapshots also sort within buckets on the
        bucket columns (sort-merge joins skip the sort on this side).
        Mutually exclusive with partition_by.

        replace_partitions: Iceberg DYNAMIC PARTITION OVERWRITE on an
        append chain: the listed partition VALUES (of partition_by) are
        superseded — chain reads mask every ancestor file under those
        partitions, and this snapshot's delta provides their new contents
        (possibly none, which deletes the partition). Rows the delta
        writes into OTHER partitions still append as usual, so one commit
        can atomically move rows out of a partition (the quarantine
        redrive pattern). Requires parent, partition_by, and per-partition
        accounting (count_by == partition_by) on the chain. Pure
        metadata: no ancestor data is rewritten; time-travel reads of the
        parent still see the old partition.

        staged: write-audit-publish (Iceberg WAP): the snapshot commits
        fully — data + manifest — but CURRENT does not move and resume
        (``find_committed``) ignores it, so production readers cannot see
        it. Audit it by reading the snapshot id directly, then
        ``publish()`` it (pure metadata) or leave it for expiry to judge.
        """
        t0 = time.time()
        if bucket_by and partition_by:
            raise ValueError("bucket_by and partition_by are mutually exclusive")
        if bucket_by and cluster_by:
            raise ValueError(
                "bucketed snapshots already sort within buckets on the bucket "
                "columns; cluster_by would be destroyed by the bucket shuffle"
            )
        if bool(bucket_by) != bool(n_buckets):
            raise ValueError("bucket_by requires n_buckets (and vice versa)")
        if replace_partitions:
            if parent is None or not partition_by:
                raise ValueError(
                    "replace_partitions needs an append chain (parent) and "
                    "a partition_by column to scope the overwrite"
                )
            if count_by != partition_by:
                raise ValueError(
                    "replace_partitions needs per-partition accounting: "
                    "set count_by to the partition_by column"
                )
        if cluster_by:
            df = df.sortWithinPartitions(*cluster_by)
        snaps = self._snaps(table)
        snap = f"snap-{len(snaps) + 1:05d}"
        snap_dir = os.path.join(self._table_dir(table), snap)
        data_dir = os.path.join(snap_dir, "data")
        obs = Observation()
        observed = df.observe(obs, F.count(F.lit(1)).alias("rows"))
        if bucket_by:
            # one shuffle into bucket layout (each task owns exactly one
            # bucket → one file per bucket, no tasks×buckets fan-out);
            # in-bucket sort on the bucket columns so downstream SMJs
            # skip the sort on this side
            total = self._write_bucketed_data(
                observed, obs, data_dir, bucket_by, n_buckets, compression
            )
        else:
            writer = (
                observed
                .write.mode("overwrite")
                # token-id / unique-id heavy tables: dictionary encoding only
                # balloons then falls back (ids are near-random), and parquet
                # v2 delta-packed encodings beat v1 plain by ~30% on encode
                # time; 32MB row groups bound per-writer buffer memory when a
                # task holds one open writer per routed sink.
                .option("parquet.enable.dictionary", "false")
                .option("parquet.writer.version", "v2")
                .option("parquet.block.size", str(32 * 1024 * 1024))
            )
            if partition_by:
                writer = writer.partitionBy(partition_by)
            writer.parquet(data_dir, compression=compression)
            total = obs.get["rows"]

        spark = df.sparkSession
        per_part = None
        if count_by and count_by in df.columns:
            if partition_by == count_by:
                per_part = _footer_partition_counts(data_dir, count_by)
            else:
                # unpartitioned: one aggregate reading ONLY the count_by
                # column (column-pruned parquet scan of the written data)
                per_part = {
                    str(r[count_by]): r["n"]
                    for r in spark.read.parquet(data_dir)
                    .groupBy(count_by)
                    .agg(F.count(F.lit(1)).alias("n"))
                    .collect()
                }
        cum_total, cum_parts = total, per_part
        if parent is not None:
            pm = self.manifest(table, parent)
            if pm is None:
                raise FileNotFoundError(f"parent snapshot '{parent}' has no manifest")
            if pm.get("partition_by") != partition_by:
                raise ValueError(
                    f"append partitioning mismatch: parent {pm.get('partition_by')!r} "
                    f"vs delta {partition_by!r}"
                )
            if (pm.get("bucket_by"), pm.get("n_buckets", 0)) != (bucket_by, n_buckets):
                raise ValueError(
                    "append bucketing mismatch: parent "
                    f"{pm.get('bucket_by')!r}×{pm.get('n_buckets', 0)} vs delta "
                    f"{bucket_by!r}×{n_buckets} — co-located chain joins need one "
                    "bucket spec across the chain"
                )
            cum_total = pm.get("cumulative_row_count", pm["row_count"]) + total
            pc = pm.get("cumulative_partition_counts") or pm.get("partition_counts")
            if replace_partitions and pc is None:
                raise ValueError(
                    "replace_partitions needs the parent chain to carry "
                    "per-partition counts (count_by on every chain write)"
                )
            if pc is not None and per_part is not None:
                cum_parts = dict(pc)
                for v in replace_partitions or []:
                    # the masked ancestor rows leave the cumulative totals
                    cum_total -= cum_parts.pop(v, 0)
                for k, v in per_part.items():
                    cum_parts[k] = cum_parts.get(k, 0) + v
        stat_cols = stats_by if stats_by is not None else (cluster_by or [])
        file_stats = _footer_file_stats(data_dir, stat_cols) if stat_cols else None
        # a 0-row delta (e.g. an increment that was entirely duplicates)
        # writes no parquet files; the declared schema stands in for the
        # read-back and reads skip the snapshot via row_count == 0
        if total:
            schema_json = spark.read.parquet(data_dir).schema.jsonValue()
        else:
            schema_json = df.schema.jsonValue()
        manifest = {
            "table": table,
            "snapshot": snap,
            "committed": True,
            "created_at_unix": int(t0),
            "schema": schema_json,
            "row_count": total,
            "partition_counts": per_part,
            "cumulative_row_count": cum_total,
            "cumulative_partition_counts": cum_parts,
            "parent": parent,
            "partition_by": partition_by,
            "replace_partitions": replace_partitions,
            "bucket_by": bucket_by,
            "n_buckets": n_buckets,
            "input_fingerprint": input_fingerprint,
            "lineage": lineage or {},
            "cluster_by": cluster_by,
            # Per-file column stats live in a SIDECAR (Iceberg's
            # manifest-list pattern: the snapshot record points at
            # manifest files; it never inlines per-file entries). The
            # manifest itself stays O(1) in file count, so history(),
            # find_committed(), read() and chain walks never parse an
            # O(files) blob — only scan planning loads the sidecar.
            "file_stats_file": "file_stats.json" if file_stats is not None else None,
            "file_count": len(file_stats) if file_stats is not None else None,
            "stats_columns": stat_cols or None,
            "staged": staged,
            "metrics": {"write_seconds": round(time.time() - t0, 3)},
        }
        if file_stats is not None:
            with open(os.path.join(snap_dir, "file_stats.json"), "w") as f:
                json.dump(file_stats, f)
        with open(os.path.join(snap_dir, "manifest.json"), "w") as f:
            json.dump(manifest, f, indent=2)
        if not staged:
            with open(os.path.join(self._table_dir(table), "CURRENT"), "w") as f:
                f.write(snap)
        return manifest

    def publish(self, table: str, snap: str) -> dict:
        """Promote a STAGED snapshot (Iceberg WAP publish / cherry-pick):
        clear the staged flag and point CURRENT at it. Pure metadata —
        the data committed at staging time. Idempotent on an
        already-published snapshot.

        Publishing verifies the table's CURRENT snapshot is an ancestor
        of (or equal to) the staged one. Iceberg's WAP publish is a
        cherry-pick onto the latest state, never a rollback: if other
        snapshots committed after staging, blindly moving CURRENT would
        hide them from readers, and the next write (parent = CURRENT)
        would fork the chain and permanently orphan them. In that case
        this raises; the caller must either ``rollback`` explicitly or
        re-stage the audit on top of the new head."""
        snap = self._resolve_ref(table, snap)
        m = self.manifest(table, snap)
        if m is None or not m.get("committed"):
            raise FileNotFoundError(
                f"cannot publish: no committed snapshot '{snap}' in '{table}'"
            )
        cur = self.current_snapshot(table)
        if cur is not None and cur != snap and cur not in self._chain(table, snap):
            raise ValueError(
                f"cannot publish '{snap}': table '{table}' advanced to '{cur}' "
                f"after staging (not an ancestor of the staged snapshot). "
                f"Publishing would hide '{cur}' and fork the chain — rollback "
                f"explicitly or re-stage on top of the new head."
            )
        if m.get("staged"):
            m["staged"] = False
            with open(
                os.path.join(self._table_dir(table), snap, "manifest.json"), "w"
            ) as f:
                json.dump(m, f, indent=2)
        with open(os.path.join(self._table_dir(table), "CURRENT"), "w") as f:
            f.write(snap)
        return m

    def delete_rows(
        self,
        spark: SparkSession,
        table: str,
        keys: DataFrame,
        on: list[str],
        *,
        input_fingerprint: str = "",
        lineage: dict | None = None,
    ) -> dict:
        """Iceberg EQUALITY DELETE, merge-on-read: commit a snapshot that
        carries only a key file — rows in EARLIER snapshots whose ``on``
        columns match any key row are dead to every read at or above this
        snapshot; rows appended LATER are untouched (standard Iceberg
        sequence-number semantics). No data file is rewritten; compaction
        is the rewrite that applies deletes physically.

        This is the takedown/contamination-removal primitive a training
        corpus needs at 10^12 rows: deleting a document list costs one
        small key file plus one column-pruned accounting scan, not a
        rewrite of the table. Note the interplay with the dedup_keys
        chain: deleted content's keys stay committed, so re-shipped
        copies of taken-down content are still dropped — which is the
        desired takedown semantics.

        Accounting stays EXACT: one column-pruned broadcast semi-join
        against the current chain counts the matching rows (total and
        per-partition) before commit, and the manifest's cumulative
        totals subtract them. Reads apply the keys as a broadcast
        LEFT ANTI join per chain element — broadcast preserves the
        child's partitioning, so bucketed chain elements keep their
        shuffle-free join property through a delete.
        """
        if not on:
            raise ValueError("delete_rows needs at least one key column")
        parent = self.current_snapshot(table)
        if parent is None:
            raise FileNotFoundError(f"no committed snapshot for table '{table}'")
        pm = self.manifest(table, parent)
        part_key = pm.get("partition_by")

        # Materialize the key file FIRST, then account from the re-read:
        # if the caller's keys DataFrame is non-deterministic (sampling,
        # limit, shuffle-order-dependent), evaluating it once for
        # accounting and again for the write would commit a different key
        # set than the one counted, breaking the exact-accounting
        # invariant. Counting from the parquet we just wrote makes the
        # committed keys and the recorded counts provably the same set.
        # A crash after this write but before the manifest leaves an
        # uncommitted snap dir (no manifest) — same crash-safety story as
        # every other write path.
        snaps = self._snaps(table)
        snap = f"snap-{len(snaps) + 1:05d}"
        snap_dir = os.path.join(self._table_dir(table), snap)
        delete_dir = os.path.join(snap_dir, "deletes")
        keys.select(*on).distinct().coalesce(1).write.mode("overwrite").parquet(
            delete_dir
        )
        committed_keys = spark.read.parquet(delete_dir)
        if _broadcast_estimate_bytes(delete_dir) <= _DELETE_BROADCAST_MAX_BYTES:
            committed_keys = F.broadcast(committed_keys)

        # exact accounting scan: only the key + partition columns are read
        doomed = self.read(spark, table, parent).join(
            committed_keys, on, "left_semi"
        )
        if part_key:
            per_part_deleted = {
                str(r[part_key]): r["n"]
                for r in doomed.groupBy(part_key)
                .agg(F.count(F.lit(1)).alias("n"))
                .collect()
            }
            deleted_total = sum(per_part_deleted.values())
        else:
            per_part_deleted = None
            deleted_total = doomed.count()

        cum_total = pm.get("cumulative_row_count", pm["row_count"]) - deleted_total
        pc = pm.get("cumulative_partition_counts") or pm.get("partition_counts")
        cum_parts = None
        if pc is not None:
            cum_parts = dict(pc)
            for k, v in (per_part_deleted or {}).items():
                left = cum_parts.get(k, 0) - v
                if left > 0:
                    cum_parts[k] = left
                else:
                    cum_parts.pop(k, None)
        manifest = {
            "table": table,
            "snapshot": snap,
            "committed": True,
            "created_at_unix": int(time.time()),
            "schema": pm["schema"],
            "row_count": 0,
            "partition_counts": {} if part_key else None,
            "deleted_row_count": deleted_total,
            "deleted_partition_counts": per_part_deleted,
            "equality_delete_cols": list(on),
            "cumulative_row_count": cum_total,
            "cumulative_partition_counts": cum_parts,
            "parent": parent,
            "partition_by": pm.get("partition_by"),
            "bucket_by": pm.get("bucket_by"),
            "n_buckets": pm.get("n_buckets", 0),
            "input_fingerprint": input_fingerprint,
            "lineage": {**(lineage or {}), "op": "equality-delete"},
        }
        with open(os.path.join(snap_dir, "manifest.json"), "w") as f:
            json.dump(manifest, f, indent=2)
        with open(os.path.join(self._table_dir(table), "CURRENT"), "w") as f:
            f.write(snap)
        return manifest

    def _delete_specs(
        self, table: str, snaps: list[str]
    ) -> dict[str, list[tuple[list[str], str]]]:
        """For each chain snapshot (oldest first): the (key_cols,
        delete_dir) pairs from STRICTLY LATER delete snapshots that apply
        to its rows. Manifests only."""
        specs: dict[str, list[tuple[list[str], str]]] = {}
        acc: list[tuple[list[str], str]] = []
        for s in reversed(snaps):
            specs[s] = list(acc)
            m = self.manifest(table, s) or {}
            if m.get("equality_delete_cols"):
                acc.append(
                    (
                        m["equality_delete_cols"],
                        os.path.join(self._table_dir(table), s, "deletes"),
                    )
                )
        return specs

    def _apply_deletes(
        self,
        spark: SparkSession,
        df: DataFrame,
        specs: list[tuple[list[str], str]],
    ) -> DataFrame:
        # many takedowns accumulate many delete snapshots; group the key
        # files by key-column set so a chain element pays ONE broadcast
        # anti-join per column set, not one per delete commit (the union
        # of key files is what Iceberg's reader does with its delete-file
        # list for a data file)
        grouped: dict[tuple[str, ...], list[str]] = {}
        for cols, delete_dir in specs:
            grouped.setdefault(tuple(cols), []).append(delete_dir)
        for cols, dirs in grouped.items():
            keys = spark.read.parquet(*dirs)
            # broadcast preserves the child's (bucketed) partitioning, so
            # it's the default — but the accumulated key union grows with
            # every takedown, so past the size bound fall back to a plain
            # anti-join (one shuffle) rather than blow executor memory on
            # an unbounded broadcast. Gated on the estimated IN-MEMORY
            # size (footer uncompressed stats), not at-rest snappy bytes.
            if _broadcast_estimate_bytes(*dirs) <= _DELETE_BROADCAST_MAX_BYTES:
                keys = F.broadcast(keys)
            df = df.join(keys, list(cols), "left_anti")
        return df

    # -- snapshot history / time travel --------------------------------

    def history(self, table: str) -> list[dict]:
        """Commit log, oldest first (Iceberg's ``table.history()``): one
        entry per committed snapshot with its timestamp, lineage op,
        parent, and row accounting. Reads only manifests — never data."""
        out = []
        for s in self._snaps(table):
            m = self.manifest(table, s)
            if not m or not m.get("committed"):
                continue
            out.append(
                {
                    "snapshot": s,
                    "created_at_unix": m.get("created_at_unix"),
                    "op": (m.get("lineage") or {}).get("op"),
                    "parent": m.get("parent"),
                    "row_count": m.get("row_count"),
                    "cumulative_row_count": m.get("cumulative_row_count"),
                    "is_current": s == self.current_snapshot(table),
                    "tags": sorted(
                        t for t, ts in self.tags(table).items() if ts == s
                    ),
                }
            )
        return out

    # -- tags (named snapshot refs) -------------------------------------

    def _tags_path(self, table: str) -> str:
        return os.path.join(self._table_dir(table), "TAGS.json")

    def tags(self, table: str) -> dict[str, str]:
        """All tags: name → snapshot id (Iceberg named references)."""
        p = self._tags_path(table)
        if not os.path.exists(p):
            return {}
        with open(p) as f:
            return json.load(f)

    def tag(self, table: str, name: str, snap: str | None = None) -> str:
        """Pin a name to a committed snapshot (Iceberg ``create_tag``):
        an immutable, human-meaningful reference — 'prod', 'pre-purge',
        'audit-2026-08' — that ``read(snap=name)`` and expiry both
        resolve. Defaults to CURRENT. Pure metadata; re-tagging an
        existing name errors (drop it first), matching Iceberg."""
        if name.startswith("snap-"):
            raise ValueError("tag names must not collide with snapshot ids")
        snap = self._resolve_ref(table, snap) or self.current_snapshot(table)
        m = self.manifest(table, snap)
        if m is None or not m.get("committed"):
            raise FileNotFoundError(
                f"cannot tag: no committed snapshot '{snap}' in '{table}'"
            )
        tags = self.tags(table)
        if name in tags:
            raise ValueError(
                f"tag '{name}' already exists (on {tags[name]}); "
                "drop_tag it first"
            )
        tags[name] = snap
        with open(self._tags_path(table), "w") as f:
            json.dump(tags, f, indent=2)
        return snap

    def drop_tag(self, table: str, name: str) -> None:
        tags = self.tags(table)
        if name not in tags:
            raise KeyError(f"no tag '{name}' on '{table}'")
        del tags[name]
        with open(self._tags_path(table), "w") as f:
            json.dump(tags, f, indent=2)

    def _resolve_ref(self, table: str, ref: str | None) -> str | None:
        """A snapshot argument anywhere in the API may be a snapshot id
        or a tag name."""
        if ref is None or ref.startswith("snap-"):
            return ref
        tags = self.tags(table)
        if ref in tags:
            return tags[ref]
        return ref

    def rollback(self, table: str, snap: str) -> dict:
        """Point CURRENT back at an older committed snapshot (Iceberg
        ``rollback_to_snapshot``). Pure metadata — no data moves; newer
        snapshots stay on disk (roll forward by rolling 'back' to them)
        until ``expire_snapshots`` reclaims them. Time-travel READS don't
        need this — ``read(table, snap=...)`` already scans any committed
        snapshot — rollback changes what readers of CURRENT see next.
        Accepts a tag name as well as a snapshot id."""
        snap = self._resolve_ref(table, snap)
        m = self.manifest(table, snap)
        if m is None or not m.get("committed"):
            raise FileNotFoundError(
                f"cannot roll back '{table}' to {snap}: not a committed snapshot"
            )
        with open(os.path.join(self._table_dir(table), "CURRENT"), "w") as f:
            f.write(snap)
        return m

    # -- bucketed layout ---------------------------------------------

    @staticmethod
    def _bucket_table_name(data_dir: str) -> str:
        """Deterministic session-catalog name for a bucketed snapshot's
        external table — path-hashed so re-registration in a fresh
        session (resume in a new JVM) lands on the same name and two
        snapshots never collide."""
        import hashlib

        return "qsvb_" + hashlib.md5(
            os.path.abspath(data_dir).encode()
        ).hexdigest()[:16]

    def _write_bucketed_data(
        self,
        observed: DataFrame,
        obs: Observation,
        data_dir: str,
        bucket_by: list[str],
        n_buckets: int,
        compression: str,
    ) -> int:
        """Write through Spark's native bucketed writer (external table at
        the snap data dir). repartition(n_buckets, cols) uses the same
        murmur3 HashPartitioning as the bucket assignment, so each write
        task owns exactly one bucket → exactly n_buckets files, never a
        tasks×buckets fan-out."""
        spark = observed.sparkSession
        name = self._bucket_table_name(data_dir)
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        (
            observed.repartition(n_buckets, *bucket_by)
            .write.mode("overwrite")
            .format("parquet")
            .option("path", data_dir)
            .option("compression", compression)
            .option("parquet.enable.dictionary", "false")
            .option("parquet.writer.version", "v2")
            .option("parquet.block.size", str(32 * 1024 * 1024))
            .bucketBy(n_buckets, *bucket_by)
            .sortBy(*bucket_by)
            .saveAsTable(name)
        )
        return obs.get["rows"]

    def _register_bucketed(self, spark: SparkSession, table: str, snap: str) -> str:
        """Attach a bucketed snapshot's files to the session catalog (no-op
        if already attached). Spark only exploits bucketing through table
        metadata, not bare parquet paths; the manifest carries everything
        needed to recreate the DDL, so a fresh session resumes with the
        same shuffle-free join property. The bucket id lives in each file
        name (Spark's ``part-…_NNNNN`` convention), so re-registering
        files written by the bucketed writer is exact."""
        from pyspark.sql import types as T

        m = self.manifest(table, snap)
        if not m or not m.get("bucket_by"):
            raise ValueError(f"snapshot {table}/{snap} is not bucketed")
        data_dir = os.path.join(self._table_dir(table), snap, "data")
        name = self._bucket_table_name(data_dir)
        if not spark.catalog.tableExists(name):
            st = T.StructType.fromJson(m["schema"])
            cols_ddl = ", ".join(
                f"`{f.name}` {f.dataType.simpleString()}" for f in st.fields
            )
            bcols = ", ".join(f"`{c}`" for c in m["bucket_by"])
            spark.sql(
                f"CREATE TABLE {name} ({cols_ddl}) USING PARQUET "
                f"CLUSTERED BY ({bcols}) SORTED BY ({bcols}) "
                f"INTO {m['n_buckets']} BUCKETS "
                f"LOCATION '{data_dir}'"
            )
        return name

    # -- read -------------------------------------------------------

    def _chain(self, table: str, snap: str) -> list[str]:
        """Snapshot ids from the chain root to ``snap`` (oldest first)."""
        chain: list[str] = []
        cur: str | None = snap
        while cur is not None:
            chain.append(cur)
            m = self.manifest(table, cur)
            cur = m.get("parent") if m else None
        return list(reversed(chain))

    def _replaced_after(self, table: str, snaps: list[str]) -> dict[str, set]:
        """For each snapshot in the (oldest-first) chain, the set of
        partition values that STRICTLY LATER snapshots declared replaced —
        files of this snapshot under those partitions are dead to any read
        at or above the chain head. Manifests only."""
        masks: dict[str, set] = {}
        acc: set = set()
        for s in reversed(snaps):
            masks[s] = set(acc)
            m = self.manifest(table, s) or {}
            acc |= set(m.get("replace_partitions") or [])
        return masks

    def _unmasked_partition_dirs(
        self, data_dir: str, partition_key: str, mask: set
    ) -> list[str]:
        """Partition directories of one snapshot's data dir whose value is
        not masked. One-level listing, same metadata scope as
        data_files(); values decode exactly as Spark encoded them."""
        out = []
        for d in sorted(os.listdir(data_dir)):
            if not d.startswith(f"{partition_key}="):
                continue
            if urllib.parse.unquote(d.split("=", 1)[1]) not in mask:
                out.append(os.path.join(data_dir, d))
        return out

    def read(
        self,
        spark: SparkSession,
        table: str,
        snap: str | None = None,
        *,
        follow_parents: bool = True,
    ) -> DataFrame:
        """Read a snapshot. Append chains resolve to a union of
        per-snapshot scans (Spark's partitioned-parquet discovery requires
        one directory structure per root, so chained roots can't share a
        FileScan); predicate pushdown and partition pruning apply to every
        branch, and compaction resets chain length to 1 so plans stay
        bounded. follow_parents=False reads only the snapshot's own
        delta."""
        dfs = self.read_parts(spark, table, snap, follow_parents=follow_parents)
        if not dfs:
            # every file masked by partition replacement: empty frame
            # with the chain head's schema
            m = self.manifest(table, snap or self.current_snapshot(table))
            return spark.createDataFrame(
                [], T.StructType.fromJson(m["schema"])
            )
        df = dfs[0]
        for other in dfs[1:]:
            # allowMissingColumns = Iceberg add-column schema evolution:
            # an increment that shipped a new column unions with older
            # snapshots projecting null for it (and vice versa)
            df = df.unionByName(other, allowMissingColumns=True)
        return df

    def read_parts(
        self,
        spark: SparkSession,
        table: str,
        snap: str | None = None,
        *,
        follow_parents: bool = True,
    ) -> list[DataFrame]:
        """One DataFrame per snapshot in the chain (oldest first), each a
        single scan. Bucketed snapshots come back as session-catalog table
        scans that REPORT their hash partitioning to the planner — callers
        that join/anti-join the chain element-wise keep every element
        shuffle-free on the bucket key, which a union (whose output
        partitioning Spark discards) cannot."""
        snap = self._resolve_ref(table, snap) or self.current_snapshot(table)
        if snap is None:
            raise FileNotFoundError(f"no committed snapshot for table '{table}'")
        snaps = self._chain(table, snap) if follow_parents else [snap]
        masks = self._replaced_after(table, snaps)
        deletes = self._delete_specs(table, snaps)
        parts: list[DataFrame] = []
        for s in snaps:
            m = self.manifest(table, s) or {}
            if m.get("equality_delete_cols"):
                continue  # delete snapshots carry keys, not data
            if m.get("row_count") == 0:
                continue  # empty delta: no files on disk
            data_dir = os.path.join(self._table_dir(table), s, "data")
            mask = masks.get(s) or set()
            if m.get("bucket_by"):
                parts.append(spark.table(self._register_bucketed(spark, table, s)))
            elif mask and m.get("partition_by"):
                # a later snapshot replaced some of this one's partitions:
                # read only the surviving partition directories (basePath
                # keeps the partition column in the schema)
                keep = self._unmasked_partition_dirs(
                    data_dir, m["partition_by"], mask
                )
                if not keep:
                    continue
                parts.append(
                    spark.read.option("basePath", data_dir).parquet(*keep)
                )
            else:
                parts.append(spark.read.parquet(data_dir))
            if deletes.get(s):
                # broadcast LEFT ANTI keeps the part's reported
                # partitioning (bucketed parts stay join-co-located)
                parts[-1] = self._apply_deletes(spark, parts[-1], deletes[s])
        return parts

    # -- maintenance ------------------------------------------------

    def data_files(
        self,
        table: str,
        snap: str | None = None,
        *,
        follow_parents: bool = True,
    ) -> list[dict]:
        """List a snapshot's data files with sizes and partition value
        (append chains included unless follow_parents=False).

        The emulation-layer stand-in for Iceberg's manifest file list —
        a real catalog answers this from metadata, never by listing
        storage; here the snapshot directory IS the metadata scope, so
        the walk stays bounded to the snapshot chain.
        """
        snap = self._resolve_ref(table, snap) or self.current_snapshot(table)
        if snap is None:
            return []
        snaps = self._chain(table, snap) if follow_parents else [snap]
        masks = self._replaced_after(table, snaps)
        out: list[dict] = []
        for s in snaps:
            data_dir = os.path.join(self._table_dir(table), s, "data")
            mask = masks.get(s) or set()
            for root, _, files in os.walk(data_dir):
                for fn in sorted(files):
                    if not fn.endswith(".parquet"):
                        continue
                    p = os.path.join(root, fn)
                    rel = os.path.relpath(root, data_dir)
                    part = None
                    if rel != "." and "=" in rel:
                        part = urllib.parse.unquote(rel.split("=", 1)[1])
                    if part is not None and part in mask:
                        continue  # replaced by a later snapshot
                    out.append(
                        {"path": p, "bytes": os.path.getsize(p),
                         "partition": part, "snapshot": s}
                    )
        return out

    # -- stats-pruned scan -------------------------------------------

    @staticmethod
    def _stats_admit(entry: dict, filters: list[tuple], partition_by) -> bool:
        """Could a file possibly contain rows matching every filter?
        Conservative: a column with no recorded stats admits the file.
        Filters are (col, op, value) with op in = < <= > >=."""
        for col, op, val in filters:
            if partition_by == col and entry.get("partition") is not None:
                p = entry["partition"]
                # partition values are stored as strings; compare like-typed
                try:
                    p = type(val)(p)
                except (TypeError, ValueError):
                    pass
                lo = hi = p
            else:
                rng = (entry.get("stats") or {}).get(col)
                if rng is None:
                    continue
                lo, hi = rng
            try:
                if op == "=" and not (lo <= val <= hi):
                    return False
                if op == "<" and not (lo < val):
                    return False
                if op == "<=" and not (lo <= val):
                    return False
                if op == ">" and not (hi > val):
                    return False
                if op == ">=" and not (hi >= val):
                    return False
            except TypeError:
                # stat/value types don't order together → can't prune safely
                continue
        return True

    def plan_scan(
        self,
        table: str,
        filters: list[tuple],
        snap: str | None = None,
        *,
        follow_parents: bool = True,
    ) -> list[dict]:
        """File-pruning scan plan from manifest ``file_stats`` alone — no
        storage listing, no footer reads (Iceberg's manifest-level
        lower_bounds/upper_bounds pruning). Returns one entry per snapshot
        in the chain: ``{"snapshot", "data_dir", "paths", "total_files"}``
        where paths is the admitted subset (None = stats absent, scan the
        whole directory)."""
        snap = self._resolve_ref(table, snap) or self.current_snapshot(table)
        if snap is None:
            raise FileNotFoundError(f"no committed snapshot for table '{table}'")
        out = []
        snaps = self._chain(table, snap) if follow_parents else [snap]
        masks = self._replaced_after(table, snaps)
        for s in snaps:
            m = self.manifest(table, s) or {}
            if m.get("equality_delete_cols") or m.get("row_count") == 0:
                continue  # keys-only or empty delta: no data files
            data_dir = os.path.join(self._table_dir(table), s, "data")
            mask = masks.get(s) or set()
            fs = self.file_stats(table, s)
            if fs is None:
                if mask and m.get("partition_by"):
                    # no column stats, but partition replacement still
                    # bounds the scan to the surviving partition dirs
                    keep_dirs = self._unmasked_partition_dirs(
                        data_dir, m["partition_by"], mask
                    )
                    out.append({"snapshot": s, "data_dir": data_dir,
                                "paths": keep_dirs, "total_files": None})
                else:
                    out.append({"snapshot": s, "data_dir": data_dir,
                                "paths": None, "total_files": None})
                continue
            part_key = m.get("partition_by")
            keep = [
                os.path.join(data_dir, e["path"])
                for e in fs
                if (e.get("partition") is None or e["partition"] not in mask)
                and self._stats_admit(e, filters, part_key)
            ]
            out.append({"snapshot": s, "data_dir": data_dir,
                        "paths": keep, "total_files": len(fs)})
        return out

    def scan(
        self,
        spark: SparkSession,
        table: str,
        filters: list[tuple] | None = None,
        snap: str | None = None,
        *,
        follow_parents: bool = True,
    ) -> DataFrame:
        """Read a snapshot with manifest-stats file pruning, then apply the
        filters exactly on the surviving rows (stats admit conservatively,
        the residual predicate makes the result precise — same split as an
        Iceberg scan). ``filters`` are (col, op, value) tuples, op in
        ``= < <= > >=``; with no filters this is ``read()``."""
        if not filters:
            return self.read(spark, table, snap, follow_parents=follow_parents)
        _OPS = {
            "=": lambda c, v: c == v,
            "<": lambda c, v: c < v,
            "<=": lambda c, v: c <= v,
            ">": lambda c, v: c > v,
            ">=": lambda c, v: c >= v,
        }
        for _, op, _v in filters:
            if op not in _OPS:
                raise ValueError(f"unsupported scan op {op!r}")
        _snap = self._resolve_ref(table, snap) or self.current_snapshot(table)
        _snaps = self._chain(table, _snap) if follow_parents else [_snap]
        _deletes = self._delete_specs(table, _snaps)
        parts: list[DataFrame] = []
        for plan in self.plan_scan(table, filters, snap,
                                   follow_parents=follow_parents):
            if plan["paths"] is None:
                df = spark.read.parquet(plan["data_dir"])
            elif not plan["paths"]:
                continue  # every file pruned for this snapshot
            else:
                # basePath keeps partition-column discovery working when
                # reading an explicit file subset under key=value dirs
                df = (
                    spark.read.option("basePath", plan["data_dir"])
                    .parquet(*plan["paths"])
                )
            if _deletes.get(plan["snapshot"]):
                df = self._apply_deletes(spark, df, _deletes[plan["snapshot"]])
            parts.append(df)
        if not parts:
            # all files pruned: empty frame with the manifest schema
            from pyspark.sql.types import StructType

            m = self.manifest(table, snap or self.current_snapshot(table))
            schema = StructType.fromJson(m["schema"])
            return spark.createDataFrame([], schema)
        df = parts[0]
        for other in parts[1:]:
            df = df.unionByName(other, allowMissingColumns=True)
        for col, op, val in filters:
            df = df.filter(_OPS[op](F.col(col), F.lit(val)))
        return df

    # -- snapshot expiry ---------------------------------------------

    def _manifest_ranges(
        self, table: str, snap: str, cols: list[str]
    ) -> dict[str, tuple] | None:
        """Global min/max per column across a chain, from manifest
        file_stats alone (no data read). None when any file lacks a
        recorded range for any requested column — callers then pay one
        aggregate pass instead."""
        lo: dict[str, object] = {c: None for c in cols}
        hi: dict[str, object] = {c: None for c in cols}
        for s in self._chain(table, snap):
            sm = self.manifest(table, s) or {}
            if sm.get("equality_delete_cols") or sm.get("row_count") == 0:
                continue
            fs = self.file_stats(table, s)
            if not fs:
                return None
            for e in fs:
                for c in cols:
                    rng = (e.get("stats") or {}).get(c)
                    if rng is None:
                        return None
                    lo[c] = rng[0] if lo[c] is None else min(lo[c], rng[0])
                    hi[c] = rng[1] if hi[c] is None else max(hi[c], rng[1])
        if any(lo[c] is None for c in cols):
            return None
        return {c: (lo[c], hi[c]) for c in cols}

    def expire_snapshots(self, table: str, *, keep_last: int = 1) -> list[str]:
        """Delete snapshot directories that are neither among the newest
        ``keep_last`` committed snapshots, nor CURRENT, nor TAGGED, nor a
        parent in a retained snapshot's append chain (Iceberg
        ``expire_snapshots``, which likewise never drops a snapshot a
        named reference can still reach).
        Uncommitted snap dirs (failed writes — data present, manifest
        absent) are always removed: that is the orphan-file cleanup half
        of the maintenance story. Returns the deleted snapshot ids."""
        if keep_last < 1:
            raise ValueError("keep_last must be >= 1")
        snaps = self._snaps(table)
        committed = [s for s in snaps
                     if (self.manifest(table, s) or {}).get("committed")]
        retained: set[str] = set()
        roots = set(committed[-keep_last:])
        cur = self.current_snapshot(table)
        if cur is not None:
            roots.add(cur)
        roots.update(self.tags(table).values())
        # staged (unpublished WAP) snapshots are pending audits — retained
        roots.update(
            s for s in committed
            if (self.manifest(table, s) or {}).get("staged")
        )
        for r in roots:
            retained.update(self._chain(table, r))
        deleted = []
        for s in snaps:
            if s in retained:
                continue
            shutil.rmtree(os.path.join(self._table_dir(table), s))
            deleted.append(s)
        return deleted

    def compact(
        self,
        spark: SparkSession,
        table: str,
        *,
        target_file_bytes: int = 128 * 1024 * 1024,
        cluster_by: list[str] | None = None,
        zorder: list[str] | None = None,
        snap: str | None = None,
        force: bool = False,
    ) -> dict | None:
        """Bin-pack a snapshot's small data files into ~target-size files
        (Iceberg ``rewrite_data_files``), committed as a NEW snapshot.

        Routed sinks accumulate (write-tasks × sinks) files per run; at
        10^12-row scale that is the classic small-files pattern — tiny
        row groups, metadata-bound scans. The rewrite is ONE Spark job:
        an AQE ``REBALANCE`` shuffle (coalesces small partitions AND
        splits skewed ones to ``advisoryPartitionSizeInBytes``) followed
        by the normal snapshot write, so output tasks — hence files —
        land near the target size without any driver-side file math.

        The new snapshot carries the SOURCE's input_fingerprint: it is
        the same logical data, so ``find_committed`` resume now lands on
        the compacted copy. Row preservation is checked by the caller's
        manifest (Observation row_count + footer partition counts).

        Returns the new manifest, or None when the snapshot is already
        compact (fewer than 2 sub-target files anywhere — nothing to
        bin-pack) and ``force`` is not set.

        cluster_by: also sort within the rewritten tasks (sort-based
        rewrite) — compaction is the natural moment to fix layout.

        Append chains are flattened: the rewrite reads the whole parent
        chain and commits a parent-less snapshot whose counts equal the
        chain's cumulative totals, so chain length resets to 1.

        zorder: multi-column clustering (Iceberg ``rewrite_data_files``
        sort-strategy zorder): rows are range-partitioned and sorted by a
        Morton interleave of the listed NUMERIC columns, so every file's
        min/max stats are tight on EVERY z column at once — point/range
        filters on any of them prune files, where a linear ``cluster_by``
        only serves its leading column. Column ranges come from the
        source manifests' file_stats when recorded (no extra scan) and
        from one min/max aggregate otherwise. Mutually exclusive with
        cluster_by and with partitioned/bucketed layouts.
        """
        src = snap or self.current_snapshot(table)
        m = self.manifest(table, src)
        if m is None:
            raise FileNotFoundError(f"no committed snapshot for table '{table}'")
        files = self.data_files(table, src)
        small = [f for f in files if f["bytes"] < 0.75 * target_file_bytes]
        if not force and len(small) < 2:
            return None
        df = self.read(spark, table, src)
        key = m.get("partition_by")
        if zorder:
            if cluster_by:
                raise ValueError("zorder and cluster_by are mutually exclusive")
            if key or m.get("bucket_by"):
                raise ValueError(
                    "zorder rewrites the global row order; partitioned/"
                    "bucketed layouts own their order already"
                )
        # REBALANCE is AQE-only: size the post-shuffle partitions by
        # advisory bytes for the duration of this one write. (Shuffle
        # bytes ≠ encoded parquet bytes; like Iceberg's rewrite we accept
        # the compression-ratio slack rather than probe it.)
        conf = spark.conf
        advisory_key = "spark.sql.adaptive.advisoryPartitionSizeInBytes"
        old = conf.get(advisory_key, None)
        conf.set(advisory_key, str(target_file_bytes))
        # a compacted copy must stay as prunable as its source: carry the
        # source's stats column set (recorded in the manifest; legacy
        # manifests recover it from the sidecar's stats keys)
        src_stat_cols = sorted(
            set(
                m.get("stats_columns")
                or {
                    c
                    for e in (self.file_stats(table, m["snapshot"]) or [])
                    for c in e.get("stats", {})
                }
            )
            | set(cluster_by or [])
            | set(zorder or [])
        )
        try:
            bucket_by = m.get("bucket_by")
            if bucket_by:
                # bucketed source: the bucketed writer's own
                # repartition(n_buckets) IS the bin-pack (chain → exactly
                # n_buckets files), and the layout must survive compaction
                # or the chain's shuffle-free join property dies with it.
                # Read the chain as RAW parquet paths: bucketed scans
                # report hash partitioning, which makes the planner elide
                # the writer's repartition and emit one file per
                # (bucket × chain element) instead of one per bucket —
                # exactly the small files this rewrite exists to remove.
                balanced = None
                chain = self._chain(table, src)
                del_specs = self._delete_specs(table, chain)
                for s in chain:
                    sm = self.manifest(table, s) or {}
                    if sm.get("equality_delete_cols") or sm.get("row_count") == 0:
                        continue  # keys-only or empty delta
                    part = spark.read.parquet(
                        os.path.join(self._table_dir(table), s, "data")
                    )
                    if del_specs.get(s):
                        # broadcast anti preserves partitioning, so the
                        # writer's repartition elision still holds
                        part = self._apply_deletes(spark, part, del_specs[s])
                    balanced = (
                        part
                        if balanced is None
                        else balanced.unionByName(part, allowMissingColumns=True)
                    )
            elif zorder:
                ranges = self._manifest_ranges(table, src, zorder)
                if ranges is None:
                    # stats not recorded for some file: one min/max pass
                    row = df.agg(
                        *(F.min(c).alias(f"__mn{i}") for i, c in enumerate(zorder)),
                        *(F.max(c).alias(f"__mx{i}") for i, c in enumerate(zorder)),
                    ).collect()[0]
                    ranges = {
                        c: (row[f"__mn{i}"], row[f"__mx{i}"])
                        for i, c in enumerate(zorder)
                    }
                z = _zorder_expr([(c, *ranges[c]) for c in zorder])
                total_bytes = sum(f["bytes"] for f in files) or 1
                nfiles = max(1, -(-total_bytes // target_file_bytes))
                # range-partition by z (each task owns a z range → a file
                # whose stats are tight in every z dimension), then sort
                # within the task so row groups inherit the property
                balanced = df.repartitionByRange(
                    int(nfiles), z
                ).sortWithinPartitions(z)
            else:
                balanced = df.hint("rebalance", key) if key else df.hint("rebalance")
            manifest = self.write(
                balanced,
                table,
                input_fingerprint=m.get("input_fingerprint", ""),
                lineage={
                    "op": "compact",
                    "source_snapshot": src,
                    "target_file_bytes": target_file_bytes,
                    "source_files": len(files),
                    "zorder": zorder,
                },
                partition_by=key,
                count_by=key,
                compression="snappy",
                cluster_by=cluster_by,
                stats_by=src_stat_cols or None,
                bucket_by=bucket_by,
                n_buckets=m.get("n_buckets", 0),
            )
        finally:
            if old is None:
                conf.unset(advisory_key)
            else:
                conf.set(advisory_key, old)
        return manifest
