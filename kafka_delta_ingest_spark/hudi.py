"""Jar-free Apache Hudi COPY-ON-WRITE reader — the third leg of the
open-table-format trio (Iceberg: iceberg.py, Delta: delta_standard.py).

Written from the public Apache Hudi table-format spec and storage
layout docs:

* ``.hoodie/hoodie.properties`` — java-properties table config
  (name, ``hoodie.table.type=COPY_ON_WRITE``).
* The TIMELINE: instant files directly under ``.hoodie/`` named
  ``<instant>.commit`` (completed), with ``.commit.requested`` /
  ``.inflight`` marking in-flight state transitions.  An instant is a
  ``yyyyMMddHHmmssSSS`` timestamp string; completed files carry a
  JSON ``HoodieCommitMetadata`` whose ``partitionToWriteStats`` maps
  partition path → write stats (fileId, path, prevCommit, record
  counts).
* Data files named ``<fileId>_<writeToken>_<instantTime>.parquet``.
  All files sharing a fileId form a FILE GROUP; each commit that
  touches the group adds a new FILE SLICE (copy-on-write: the whole
  group is rewritten).  A snapshot read picks, per file group, the
  slice of the latest completed instant ≤ the as-of instant.
* Hudi meta columns (``_hoodie_commit_time``, ``_hoodie_commit_seqno``,
  ``_hoodie_record_key``, ``_hoodie_partition_path``,
  ``_hoodie_file_name``) lead every data file's schema; the reader
  drops them by default (``keep_meta=False``).

Scale design: snapshot planning is a pure TIMELINE walk — commit
metadata lists every live file, so planning never lists data
directories (Hudi's own selling point for object stores: O(commits)
driver-side metadata, not O(files) listing).  The data read is one
``spark.read.parquet(*files)`` over exactly the live slices, so
partition pruning / column pruning / predicate pushdown all apply
normally.

Scope (documented seams): COPY_ON_WRITE snapshot + time travel.
MERGE_ON_READ log-file merging, replacecommit/clustering, and
incremental queries raise with a clear message.

A fixture writer (``HudiFixtureWriter``) builds REAL tables: properties
file, requested/inflight/completed instant trio per commit, meta
columns in parquet (via pyarrow), CoW rewrites for upsert/delete.
"""

from __future__ import annotations

import json
import os
import re
import uuid
from typing import Callable

_INSTANT_RE = re.compile(r"^(\d{14,17})\.(\w+)$")

META_COLS = [
    "_hoodie_commit_time",
    "_hoodie_commit_seqno",
    "_hoodie_record_key",
    "_hoodie_partition_path",
    "_hoodie_file_name",
]


def _hoodie_dir(table_path: str) -> str:
    d = os.path.join(table_path, ".hoodie")
    if not os.path.isdir(d):
        raise ValueError(f"not a Hudi table: no .hoodie at {table_path}")
    return d


def table_properties(table_path: str) -> dict:
    """Parse ``.hoodie/hoodie.properties`` (java properties subset)."""
    props = {}
    p = os.path.join(_hoodie_dir(table_path), "hoodie.properties")
    if os.path.exists(p):
        for line in open(p, encoding="utf-8"):
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            k, _, v = line.partition("=")
            props[k.strip()] = v.strip()
    return props


def completed_commits(table_path: str) -> list[tuple[str, str]]:
    """Sorted (instant, action) pairs for COMPLETED instants on the
    timeline.  Only fully-transitioned files count — ``.requested`` /
    ``.inflight`` suffixed instants are pending by definition."""
    out = []
    for name in os.listdir(_hoodie_dir(table_path)):
        m = _INSTANT_RE.match(name)
        if not m:
            continue
        instant, action = m.group(1), m.group(2)
        if action in ("commit",):
            out.append((instant, action))
        elif action in ("replacecommit", "deltacommit"):
            raise ValueError(
                f"unsupported Hudi action .{action} "
                "(COPY_ON_WRITE commits only — clustering and "
                "MERGE_ON_READ are documented seams)"
            )
    return sorted(out)


def plan_snapshot(
    table_path: str,
    as_of_instant: str | None = None,
    partition_filter: Callable[[str], bool] | None = None,
) -> tuple[list[str], str]:
    """Walk the timeline and return (live data file paths, instant).

    Per (partition, fileId) file group the LATEST slice at or before
    ``as_of_instant`` wins — the copy-on-write rule: a commit that
    touches a group rewrites it wholesale, so its newest slice is the
    complete truth for the group."""
    commits = completed_commits(table_path)
    if as_of_instant is not None:
        commits = [c for c in commits if c[0] <= as_of_instant]
    if not commits:
        raise ValueError(
            f"no completed commits at or before {as_of_instant!r}"
        )
    latest: dict[tuple[str, str], str] = {}
    for instant, _action in commits:
        meta = json.load(
            open(os.path.join(_hoodie_dir(table_path), f"{instant}.commit"),
                 encoding="utf-8")
        )
        for part, stats in meta.get("partitionToWriteStats", {}).items():
            if partition_filter is not None and not partition_filter(part):
                continue
            for st in stats:
                latest[(part, st["fileId"])] = os.path.join(
                    table_path, st["path"]
                )
    return sorted(latest.values()), commits[-1][0]


def read_hudi(
    spark,
    table_path: str,
    as_of_instant: str | None = None,
    keep_meta: bool = False,
    partition_filter: Callable[[str], bool] | None = None,
):
    """Snapshot-read a Hudi CoW table into a DataFrame, optionally at
    a time-travel instant.  ``partition_filter`` prunes partitions at
    PLAN time (before any file is opened) from the timeline metadata
    alone."""
    files, _instant = plan_snapshot(
        table_path, as_of_instant, partition_filter
    )
    if not files:
        raise ValueError("snapshot plan has no data files")
    df = spark.read.option("mergeSchema", "true").parquet(*files)
    if not keep_meta:
        df = df.drop(*META_COLS)
    return df


class HudiFixtureWriter:
    """Build a real on-disk Hudi CoW table: properties, the
    requested → inflight → completed instant trio per commit, data
    files with Hudi meta columns, and copy-on-write rewrites for
    upsert/delete.  ``record_key`` names the field used for
    ``_hoodie_record_key``."""

    def __init__(self, table_path: str, record_key: str,
                 partition_field: str | None = None,
                 table_name: str = "fixture"):
        self.path = table_path
        self.key = record_key
        self.part_field = partition_field
        self._seq = 0
        # (partition, fileId) -> list of rows currently in the group
        self._groups: dict[tuple[str, str], list[dict]] = {}
        hoodie = os.path.join(table_path, ".hoodie")
        os.makedirs(hoodie, exist_ok=True)
        with open(os.path.join(hoodie, "hoodie.properties"), "w",
                  encoding="utf-8") as f:
            f.write("hoodie.table.name=%s\n" % table_name)
            f.write("hoodie.table.type=COPY_ON_WRITE\n")
            f.write("hoodie.table.version=6\n")
            f.write("hoodie.timeline.layout.version=1\n")

    def _instant(self, ts_ms: int) -> str:
        # yyyyMMddHHmmssSSS rendered from a caller-supplied epoch ms
        # (deterministic fixtures; no wall clock)
        import datetime as _dt

        d = _dt.datetime.fromtimestamp(ts_ms / 1000, _dt.timezone.utc)
        return d.strftime("%Y%m%d%H%M%S") + f"{ts_ms % 1000:03d}"

    def _partition_of(self, row: dict) -> str:
        if self.part_field is None:
            return ""
        return f"{self.part_field}={row[self.part_field]}"

    def _write_group(self, part: str, file_id: str, rows: list[dict],
                     instant: str, prev: str,
                     template: list[dict] | None = None) -> dict:
        """Write one new file slice.  ``rows`` may be EMPTY — Hudi CoW
        represents "every record in the group was deleted" as a new
        base file with zero records (the group stays in the timeline;
        readers see no rows) — in which case ``template`` supplies the
        prior slice's rows so the empty parquet keeps typed columns."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        token = "0-1-0"
        fname = f"{file_id}_{token}_{instant}.parquet"
        rel = os.path.join(part, fname) if part else fname
        full = os.path.join(self.path, rel)
        os.makedirs(os.path.dirname(full), exist_ok=True)
        if rows:
            cols: dict[str, list] = {c: [] for c in META_COLS}
            data_keys = list(rows[0].keys())
            for c in data_keys:
                cols[c] = []
            for r in rows:
                self._seq += 1
                cols["_hoodie_commit_time"].append(instant)
                cols["_hoodie_commit_seqno"].append(
                    f"{instant}_0_{self._seq}"
                )
                cols["_hoodie_record_key"].append(str(r[self.key]))
                cols["_hoodie_partition_path"].append(part)
                cols["_hoodie_file_name"].append(fname)
                for c in data_keys:
                    cols[c].append(r[c])
            table = pa.table(cols)
        else:
            if not template:
                raise ValueError("empty slice needs a template row set")
            names = META_COLS + list(template[0].keys())
            arrays = []
            for c in names:
                if c in META_COLS:
                    arrays.append(pa.array([], type=pa.string()))
                else:
                    # Infer the column type from any non-null prior
                    # value; an all-null column degrades to string.
                    v = next(
                        (r[c] for r in template if r[c] is not None), ""
                    )
                    arrays.append(pa.array([v]).slice(0, 0))
            table = pa.table(dict(zip(names, arrays)))
        pq.write_table(table, full)
        self._groups[(part, file_id)] = list(rows)
        return {
            "fileId": file_id,
            "path": rel.replace(os.sep, "/"),
            "prevCommit": prev,
            "numWrites": len(rows),
            "numInserts": len(rows) if prev == "null" else 0,
            "numUpdateWrites": 0 if prev == "null" else len(rows),
            "fileSizeInBytes": os.path.getsize(full),
        }

    def _commit(self, stats_by_part: dict[str, list[dict]],
                instant: str, op: str):
        hoodie = os.path.join(self.path, ".hoodie")
        meta = {
            "partitionToWriteStats": stats_by_part,
            "operationType": op,
            "compacted": False,
        }
        # real timeline state transitions
        open(os.path.join(hoodie, f"{instant}.commit.requested"),
             "w").close()
        open(os.path.join(hoodie, f"{instant}.commit.inflight"),
             "w").close()
        with open(os.path.join(hoodie, f"{instant}.commit"), "w",
                  encoding="utf-8") as f:
            json.dump(meta, f)
        return instant

    def insert(self, rows: list[dict], ts_ms: int,
               groups_per_partition: int = 1) -> str:
        """INSERT commit: bucket rows into new file groups."""
        instant = self._instant(ts_ms)
        by_part: dict[str, list[dict]] = {}
        for r in rows:
            by_part.setdefault(self._partition_of(r), []).append(r)
        stats: dict[str, list[dict]] = {}
        for part, prows in sorted(by_part.items()):
            for g in range(groups_per_partition):
                grows = prows[g::groups_per_partition]
                if not grows:
                    continue
                fid = str(uuid.uuid5(
                    uuid.NAMESPACE_URL, f"{part}/{instant}/{g}"
                ))
                stats.setdefault(part, []).append(
                    self._write_group(part, fid, grows, instant, "null")
                )
        return self._commit(stats, instant, "insert")

    def upsert(self, rows: list[dict], ts_ms: int) -> str:
        """UPSERT commit: copy-on-write — every file group holding an
        affected record key is rewritten wholesale as a new slice with
        the updates applied; unmatched keys raise (fixture precondition:
        upserts target existing records)."""
        instant = self._instant(ts_ms)
        updates = {str(r[self.key]): r for r in rows}
        stats: dict[str, list[dict]] = {}
        touched = set()
        for (part, fid), grows in sorted(self._groups.items()):
            if not any(str(r[self.key]) in updates for r in grows):
                continue
            new_rows = []
            for r in grows:
                k = str(r[self.key])
                if k in updates:
                    new_rows.append(updates[k])
                    touched.add(k)
                else:
                    new_rows.append(r)
            stats.setdefault(part, []).append(
                self._write_group(part, fid, new_rows, instant, "known")
            )
        missing = set(updates) - touched
        if missing:
            raise ValueError(f"upsert keys not present: {sorted(missing)}")
        return self._commit(stats, instant, "upsert")

    def delete(self, keys: list, ts_ms: int) -> str:
        """DELETE commit: CoW rewrite of affected groups without the
        victims.  A fully-emptied group is rewritten as a ZERO-record
        base file (Hudi's representation — the group stays in the
        timeline and readers see no rows from it), so the operation is
        total over any victim set."""
        instant = self._instant(ts_ms)
        victims = {str(k) for k in keys}
        stats: dict[str, list[dict]] = {}
        for (part, fid), grows in sorted(self._groups.items()):
            if not any(str(r[self.key]) in victims for r in grows):
                continue
            survivors = [
                r for r in grows if str(r[self.key]) not in victims
            ]
            stats.setdefault(part, []).append(
                self._write_group(part, fid, survivors, instant,
                                  "known", template=grows)
            )
        return self._commit(stats, instant, "delete")
