"""Standard-layout Delta Lake table READER — jar-free, from the public
Delta transaction protocol (github.com/delta-io/delta PROTOCOL.md).

The repo's sink (sinks/delta_like.py) WRITES Delta-protocol actions
into its own ``_kdi_log``; this module READS tables that real Delta
writers (delta-spark, delta-rs, the reference ingest daemon itself —
src/delta_helpers.rs:15-40) produced under ``_delta_log/``:

* log replay: ``%020d.json`` JSON-lines commits, starting from the
  newest parquet checkpoint at or below the target version
  (``_last_checkpoint`` pointer, single- and multi-part
  ``%020d.checkpoint[.%010d.%010d].parquet``) — the log scan is
  O(commits since checkpoint), not O(table history);
* state reconstruction: latest protocol/metaData, live file set =
  adds minus removes keyed by path;
* partition columns: standard Delta stores them in ``add.
  partitionValues``, NOT in the data files. Hive-style layouts take
  the ``basePath`` fast path (one scan, Spark reconstructs partition
  columns); non-hive layouts fall back to per-partition-group scans
  with literal columns, unioned — always correct, plan size bounded
  by the number of DISTINCT partition tuples present;
* schema: ``metaData.schemaString`` is a Spark StructType JSON —
  applied to the scan so type widening/evolution follows the log, not
  parquet footers. Column-mapping mode ``name`` resolves physical →
  logical names (the sink's own column-mapping convention); ``id``
  mode (r7) uses Spark's NATIVE parquet field-id matching
  (``spark.sql.parquet.fieldId.read.enabled`` + ``parquet.field.id``
  metadata on the requested schema) so the random physical names are
  never touched; DELETION VECTORS (r7) apply via the roaring.py
  codecs — descriptors resolve driver-side to compressed bitmap
  bytes, positions expand executor-side, one (file, row_index)
  anti-join;
* time travel: ``version=`` replays to that commit; ``timestamp=``
  picks the last commit whose ``commitInfo.timestamp`` (file mtime
  fallback) is at or before the instant — the same surface
  DeltaLikeTable and the Iceberg reader expose.
"""

from __future__ import annotations

import glob
import json
import os
import urllib.parse

_LOG = "_delta_log"


class ConcurrentDeltaWriteError(RuntimeError):
    """A concurrent writer invalidated this operation's snapshot —
    the operation must be re-run against fresh state (the reference's
    conflict-detection outcome, src/lib.rs:948-1024)."""


def _log_path(table_path: str) -> str:
    p = os.path.join(table_path, _LOG)
    if not os.path.isdir(p):
        raise ValueError(f"no {_LOG} under {table_path}")
    return p


def _commit_versions(log: str, store=None) -> list[int]:
    names = store.list_dir(log) if store is not None else os.listdir(log)
    out = []
    for f in names:
        if f.endswith(".json") and f[:20].isdigit() and len(f) == 25:
            out.append(int(f[:20]))
    return sorted(out)


def _checkpoint_files(log: str, version: int, store=None) -> list[str]:
    """Files of a COMPLETE checkpoint at ``version``, else [].

    Three layouts (protocol):

    * classic single-part ``%020d.checkpoint.parquet``;
    * classic multi-part ``%020d.checkpoint.%010d.%010d.parquet``
      (part-of-total) — a crash mid-write leaves a partial set which
      must NOT qualify (replaying it would silently drop adds, r7
      ADVICE fix): completeness = every part 1..total present;
    * V2 UUID-named ``%020d.checkpoint.<uuid>.{parquet,json}`` — a
      self-contained manifest (each uuid file is a complete
      checkpoint; adds/removes may live in ``sidecar``-referenced
      files under ``_sidecars/``). Any one qualifies."""
    names = (
        store.list_dir(log) if store is not None else os.listdir(log)
    )
    single_name = f"{version:020d}.checkpoint.parquet"
    single = os.path.join(log, single_name)
    if single_name in names:
        return [single]
    cands = sorted(
        os.path.join(log, n)
        for n in names
        if n.startswith(f"{version:020d}.checkpoint.")
    )
    v2 = [
        p for p in cands
        if len(os.path.basename(p).split(".")) == 4
        and p.rsplit(".", 1)[1] in ("parquet", "json")
        and not os.path.basename(p).split(".")[2].isdigit()
    ]
    if v2:
        return [v2[-1]]  # any uuid manifest is complete; pick one
    parts = [p for p in cands if p.endswith(".parquet")]
    if not parts:
        return []
    seen: dict[int, str] = {}
    total = None
    for p in parts:
        segs = os.path.basename(p).split(".")
        # %020d.checkpoint.%010d.%010d.parquet → 5 dot-segments
        if len(segs) != 5 or not (segs[2].isdigit() and segs[3].isdigit()):
            return []
        part, tot = int(segs[2]), int(segs[3])
        if total is None:
            total = tot
        if tot != total or part in seen:
            return []  # inconsistent totals / duplicate part
        seen[part] = p
    if total is None or set(seen) != set(range(1, total + 1)):
        return []  # incomplete part set (crashed writer)
    return [seen[i] for i in range(1, total + 1)]


def _dv_uid(dv: dict | None) -> str:
    """Deletion-vector unique id per the Delta protocol: storageType +
    pathOrInlineDv (+ ``@offset`` when present); ``""`` for no DV.

    Log/checkpoint reconciliation keys add/remove actions on
    **(path, dv uid)** — NOT path alone: a delta-spark checkpoint taken
    after a DV DELETE retains a ``remove(path)`` tombstone for the
    pre-DV file alongside the live ``add(path, dv)``; a path-only
    anti-join would drop the live add and silently lose every
    surviving row of that file (r8 ADVICE, high)."""
    if not dv:
        return ""
    uid = (dv.get("storageType") or "") + (dv.get("pathOrInlineDv") or "")
    off = dv.get("offset")
    if off is not None:
        uid += f"@{off}"
    return uid


def _reconcile_remove(adds: dict, remove: dict) -> None:
    """Drop the stored add for ``remove["path"]`` only when its DV uid
    matches the remove's — the protocol's (path, dvId) keying. The
    state dict stays path-keyed (a consistent table has one live add
    per path); matching makes the pop order-independent: a tombstone
    for the superseded (path, dv_old) never cancels the live
    (path, dv_new) add, whichever is seen first."""
    cur = adds.get(remove["path"])
    if cur is not None and _dv_uid(cur.get("deletionVector")) == _dv_uid(
        remove.get("deletionVector")
    ):
        adds.pop(remove["path"], None)


def _best_checkpoint(log: str, target: int, store=None) -> int | None:
    """Newest checkpoint version ≤ target, preferring _last_checkpoint
    when it qualifies."""
    ptr = os.path.join(log, "_last_checkpoint")
    best = None
    ptr_exists = (
        store.exists(ptr) if store is not None else os.path.exists(ptr)
    )
    if ptr_exists:
        if store is not None:
            v = json.loads(store.read_bytes(ptr)).get("version")
        else:
            with open(ptr) as f:
                v = json.load(f).get("version")
        if v is not None and v <= target and _checkpoint_files(
            log, v, store
        ):
            best = v
    if best is None:
        names = (
            store.list_dir(log) if store is not None
            else os.listdir(log)
        )
        cands = set()
        for f in names:
            if ".checkpoint." in f and f[:20].isdigit():
                cands.add(int(f[:20]))
        ok = [
            v for v in cands
            if v <= target and _checkpoint_files(log, v, store)
        ]
        best = max(ok) if ok else None
    return best


# Reconstructed checkpoint states, keyed (log, cp, size, mtime_ns) of
# the first checkpoint file. Checkpoint files are immutable once
# written (a rewrite would change size/mtime and miss), and ONE
# declared read query replays the same checkpoint 2-4x per invocation
# (each time-travel count plus the final read resolves through the
# same checkpoint), each replay costing 4-6 driver-blocking Spark jobs
# (schema inference + probe collects + the add/remove reconciliation).
# This is within-process metadata reuse of an immutable file's parse —
# the data-path read under test still executes per call (r13).
_CP_STATE_MEMO: dict = {}


def _replay_checkpoint(spark, log: str, cp: int):
    """(adds, meta, protocol) reconstructed from checkpoint ``cp``.

    add/remove reconciliation runs IN SPARK: the driver collects
    only metaData/protocol (one row each) and the SURVIVING add
    actions — O(live files), not O(checkpoint rows incl. remove
    tombstones). At 1M+-file tables the remove tombstones and
    superseded adds never reach the driver (r7, was a full
    .collect() of the checkpoint). V2 checkpoints (UUID-named
    manifest, add/remove actions in `sidecar`-referenced parquet
    under _sidecars/) route their sidecars through the same
    Spark reconciliation."""
    from pyspark.sql import functions as F

    cp_files = _checkpoint_files(log, cp)
    st = os.stat(cp_files[0])
    key = (log, cp, st.st_size, st.st_mtime_ns)
    hit = _CP_STATE_MEMO.get(key)
    if hit is not None:
        adds, meta, protocol = hit
        # shallow copy: callers mutate the DICT (later commits add/
        # remove entries), never the per-add action values.
        return dict(adds), meta, protocol
    adds: dict[str, dict] = {}
    meta = None
    protocol = None
    frames = []
    sidecars: list[str] = []
    if cp_files[0].endswith(".json"):
        # v2 JSON manifest: protocol/metaData/sidecar refs parse
        # driver-side (the manifest is metadata-sized)
        with open(cp_files[0]) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                act = json.loads(line)
                if "metaData" in act:
                    meta = act["metaData"]
                elif "protocol" in act:
                    protocol = act["protocol"]
                elif "sidecar" in act:
                    sidecars.append(act["sidecar"]["path"])
                elif "add" in act:
                    adds[act["add"]["path"]] = act["add"]
                elif "remove" in act:
                    _reconcile_remove(adds, act["remove"])
    else:
        cpdf = spark.read.parquet(*cp_files)
        cols = set(cpdf.columns)
        # ONE probe job for the metadata-sized actions (r13): the
        # metaData / protocol / sidecar rows were three separate
        # filter+collect jobs over the same checkpoint scan — each a
        # driver-blocking round trip on every replay.
        probe = {
            "metaData": "metaData.id",
            "protocol": "protocol.minReaderVersion",
            "sidecar": "sidecar.path",
        }
        want = [c for c in probe if c in cols]
        if want:
            cond = None
            for c in want:
                nn = F.col(probe[c]).isNotNull()
                cond = nn if cond is None else (cond | nn)
            for row in cpdf.filter(cond).select(*want).collect():
                d = row.asDict()
                if d.get("metaData") is not None and (
                    d["metaData"].id is not None
                ):
                    meta = d["metaData"].asDict(recursive=True)
                if d.get("protocol") is not None and (
                    d["protocol"].minReaderVersion is not None
                ):
                    protocol = d["protocol"].asDict(recursive=True)
                if d.get("sidecar") is not None and (
                    d["sidecar"].path is not None
                ):
                    sidecars.append(d["sidecar"].path)
        if "add" in cols:
            frames.append(cpdf)
    if sidecars:
        frames.append(
            spark.read.parquet(
                *[os.path.join(log, "_sidecars", p)
                  for p in sidecars]
            )
        )

    def _uid_col(fr, prefix):
        # protocol reconciliation key: (path, dv uid) — see
        # _dv_uid. "" when the struct has no deletionVector field
        # (pre-DV checkpoints) or the row carries none.
        fields = fr.schema[prefix].dataType.fieldNames()
        if "deletionVector" not in fields:
            return F.lit("")
        dv = F.col(f"{prefix}.deletionVector")
        base = F.concat(
            F.coalesce(dv["storageType"], F.lit("")),
            F.coalesce(dv["pathOrInlineDv"], F.lit("")),
        )
        with_off = F.when(
            dv["offset"].isNotNull(),
            F.concat(base, F.lit("@"),
                     dv["offset"].cast("string")),
        ).otherwise(base)
        return F.when(
            dv["storageType"].isNotNull(), with_off
        ).otherwise(F.lit(""))

    adds_df = None
    rm = None
    for fr in frames:
        fcols = set(fr.columns)
        if "add" in fcols:
            a = fr.filter(F.col("add.path").isNotNull()).select(
                "add", _uid_col(fr, "add").alias("_add_uid")
            )
            adds_df = a if adds_df is None else adds_df.unionByName(
                a, allowMissingColumns=True
            )
        if "remove" in fcols:
            r = fr.filter(F.col("remove.path").isNotNull()).select(
                F.col("remove.path").alias("_rm_path"),
                _uid_col(fr, "remove").alias("_rm_uid"),
            )
            rm = r if rm is None else rm.unionByName(r)
    if adds_df is not None:
        if rm is not None:
            adds_df = adds_df.join(
                rm,
                (adds_df["add"]["path"] == rm["_rm_path"])
                & (adds_df["_add_uid"] == rm["_rm_uid"]),
                "left_anti",
            )
        for row in adds_df.collect():
            a = row.add.asDict(recursive=True)
            adds[a["path"]] = a
    if len(_CP_STATE_MEMO) > 64:
        _CP_STATE_MEMO.clear()
    _CP_STATE_MEMO[key] = (dict(adds), meta, protocol)
    return adds, meta, protocol


def _replay(spark, table_path: str, target: int) -> dict:
    """Reconstruct table state at ``target``: live adds, metaData,
    protocol."""
    log = _log_path(table_path)
    adds: dict[str, dict] = {}
    meta = None
    protocol = None
    start = 0
    cp = _best_checkpoint(log, target)
    if cp is not None:
        adds, meta, protocol = _replay_checkpoint(spark, log, cp)
        start = cp + 1
    for v in _commit_versions(log):
        if v < start or v > target:
            continue
        with open(os.path.join(log, f"{v:020d}.json")) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                act = json.loads(line)
                if "metaData" in act:
                    meta = act["metaData"]
                elif "protocol" in act:
                    protocol = act["protocol"]
                elif "add" in act:
                    adds[act["add"]["path"]] = act["add"]
                elif "remove" in act:
                    _reconcile_remove(adds, act["remove"])
    if meta is None:
        raise ValueError("log replay found no metaData action")
    return {"adds": list(adds.values()), "meta": meta,
            "protocol": protocol}


def _resolve_version(log: str, version=None, timestamp_ms=None) -> int:
    versions = _commit_versions(log)
    if not versions:
        raise ValueError("empty Delta log")
    if version is not None:
        if version > max(versions):
            raise ValueError(f"version {version} beyond log end")
        if version < versions[0] and _best_checkpoint(log, version) is None:
            raise ValueError(
                f"version {version} before earliest available commit "
                f"({versions[0]}) and no checkpoint covers it"
            )
        return version
    if timestamp_ms is not None:
        best = None
        for v in versions:
            path = os.path.join(log, f"{v:020d}.json")
            ts = None
            with open(path) as f:
                for line in f:
                    act = json.loads(line)
                    if "commitInfo" in act:
                        ts = act["commitInfo"].get("timestamp")
                        break
            if ts is None:
                ts = int(os.path.getmtime(path) * 1000)
            if ts <= timestamp_ms:
                best = v
        if best is None:
            raise ValueError(f"no commit at or before {timestamp_ms}")
        return best
    return max(versions)


def _relax_type(t):
    """Recursively relax EVERY nullability flag in a schema-JSON type:
    struct-field ``nullable``, array ``containsNull``, map
    ``valueContainsNull``."""
    if isinstance(t, dict):
        k = t.get("type")
        if k == "struct":
            return {
                "type": "struct",
                "fields": [
                    {**f, "nullable": True,
                     "type": _relax_type(f["type"])}
                    for f in t["fields"]
                ],
            }
        if k == "array":
            return {
                **t,
                "containsNull": True,
                "elementType": _relax_type(t["elementType"]),
            }
        if k == "map":
            return {
                **t,
                "valueContainsNull": True,
                "keyType": _relax_type(t["keyType"]),
                "valueType": _relax_type(t["valueType"]),
            }
    return t


def _nullable_schema_json(schema) -> str:
    """Schema JSON with every field (at every level, incl. array
    containsNull / map valueContainsNull) nullable — what delta-spark
    stores for DataFrame writes without explicit NOT NULL constraints.
    Freezing Spark's incidental non-nullability (range(), literals)
    into schemaString would make ordinary subset appends illegal
    forever; NOT NULL is an explicit-constraint feature, not a side
    effect of the first frame."""
    j = json.loads(schema.json())
    return json.dumps(
        {
            "type": "struct",
            "fields": [
                {**f, "nullable": True, "type": _relax_type(f["type"])}
                for f in j["fields"]
            ],
        }
    )


def _map_type_json(t, field_fn):
    """Recursively rewrite every field of a schema-JSON type through
    ``field_fn`` — column mapping applies at EVERY nesting level
    (struct/array/map), not just the top (r8 ADVICE, low)."""
    if isinstance(t, dict):
        k = t.get("type")
        if k == "struct":
            return {
                "type": "struct",
                "fields": [
                    {**field_fn(f),
                     "type": _map_type_json(f["type"], field_fn)}
                    for f in t["fields"]
                ],
            }
        if k == "array":
            return {
                **t,
                "elementType": _map_type_json(t["elementType"], field_fn),
            }
        if k == "map":
            return {
                **t,
                "keyType": _map_type_json(t["keyType"], field_fn),
                "valueType": _map_type_json(t["valueType"], field_fn),
            }
    return t


def _phys_field_json(f):
    """Name-mode leaf transform: physicalName rename, metadata cleared."""
    phys = (f.get("metadata") or {}).get(
        "delta.columnMapping.physicalName"
    ) or f["name"]
    return {**f, "name": phys, "metadata": {}}


def _id_leaf_json(f):
    """Id-mode leaf transform: parquet.field.id metadata (Spark's
    native field-id matching then resolves nested columns too)."""
    fid = (f.get("metadata") or {}).get("delta.columnMapping.id")
    if fid is None:
        raise ValueError(
            f"columnMapping mode 'id' but field {f['name']!r} "
            "has no delta.columnMapping.id"
        )
    return {**f, "metadata": {"parquet.field.id": int(fid)}}


def _schema_mapping(meta: dict):
    """(logical StructType, physical→logical top-level rename map or
    None, partition columns, id-mode flag, read_fields).

    ``read_fields`` maps each LOGICAL top-level column to the
    StructField the parquet SCAN should request: recursive physical
    names under mode ``name``; logical names annotated with
    ``parquet.field.id`` at every nesting level under mode ``id`` (the
    scan then uses Spark's NATIVE field-id matching and never touches
    the random physical names); the logical field itself otherwise."""
    from pyspark.sql.types import StructField, StructType

    schema_json = json.loads(meta["schemaString"])
    logical = StructType.fromJson(schema_json)
    conf = meta.get("configuration") or {}
    mode = conf.get("delta.columnMapping.mode", "none")
    rename = None
    read_fields = {f.name: f for f in logical.fields}
    if mode in ("name", "id"):
        rename = {}
        for f in schema_json.get("fields", []):
            phys = (f.get("metadata") or {}).get(
                "delta.columnMapping.physicalName"
            )
            if phys:
                rename[phys] = f["name"]
    if mode == "name":
        read_fields = {
            f["name"]: StructField.fromJson(
                {**_phys_field_json(f),
                 "type": _map_type_json(f["type"], _phys_field_json)}
            )
            for f in schema_json.get("fields", [])
        }
    elif mode == "id":
        read_fields = {
            f["name"]: StructField.fromJson(
                {**_id_leaf_json(f),
                 "type": _map_type_json(f["type"], _id_leaf_json)}
            )
            for f in schema_json.get("fields", [])
        }
    parts = list(meta.get("partitionColumns") or [])
    if rename:
        # the protocol tracks partitionColumns AND add.partitionValues
        # under PHYSICAL names in mapping mode — resolve to logical.
        parts = [rename.get(c, c) for c in parts]
    return logical, rename, parts, mode == "id", read_fields


def read_delta(spark, table_path: str, version=None, timestamp_ms=None):
    """Read a standard-layout Delta Lake table (``_delta_log``) into a
    DataFrame at the latest, an explicit ``version``, or a
    ``timestamp_ms`` time-travel instant. See module docstring."""
    from pyspark.sql import functions as F

    log = _log_path(table_path)
    target = _resolve_version(log, version, timestamp_ms)
    state = _replay(spark, table_path, target)
    adds = state["adds"]
    if not adds:
        raise ValueError(f"no live files at version {target}")
    dv_adds = [a for a in adds if a.get("deletionVector")]
    logical, rename, part_cols, id_mode, read_fields = _schema_mapping(
        state["meta"]
    )
    if id_mode:
        # id mode: Spark's parquet reader matches columns BY FIELD ID
        # when the requested schema carries `parquet.field.id`
        # metadata — set logical names directly, no physical renames.
        spark.conf.set("spark.sql.parquet.fieldId.read.enabled", "true")

    def _abs(p: str) -> str:
        p = urllib.parse.unquote(p)
        if p.startswith("file:"):
            p = p[len("file:"):]
        if os.path.isabs(p):
            return p
        return os.path.join(table_path, p)

    data_fields = [f for f in logical.fields if f.name not in part_cols]
    phys_of = {}
    if rename:
        inv = {v: k for k, v in rename.items()}
        phys_of = {f.name: inv.get(f.name, f.name) for f in logical.fields}
    else:
        phys_of = {f.name: f.name for f in logical.fields}

    from pyspark.sql.types import StructType

    # read_fields carries the scan-side shape per mapping mode:
    # recursive physical names (name), field-id-annotated logical
    # names at every level (id), or the logical field itself (none).
    read_schema = StructType(
        [read_fields[f.name] for f in data_fields]
    )

    def _has_hive_segment(path: str, col: str) -> bool:
        # match whole directory segments ("lang=en"), not substrings —
        # a partition column named "e" must not match "date=2024".
        return any(
            seg.split("=", 1)[0] == col
            for seg in path.split("/")
            if "=" in seg
        )

    hive = bool(part_cols) and all(
        all(_has_hive_segment(a["path"], phys_of[c]) for c in part_cols)
        for a in adds
    )

    def _with_dv_meta(frame):
        # DV application keys on Spark's hidden parquet columns —
        # selected INSIDE each scan (they are not addressable after a
        # union)
        if not dv_adds:
            return frame
        return frame.select(
            "*",
            F.regexp_replace(
                F.col("_metadata.file_path"), "^file:(//)?", ""
            ).alias("_kdi_fp"),
            F.col("_metadata.row_index").alias("_kdi_pos"),
        )

    if not part_cols:
        df = _with_dv_meta(
            spark.read.schema(read_schema).parquet(
                *[_abs(a["path"]) for a in adds]
            )
        )
    elif hive and rename is None:
        # hive-style layout: ONE scan; Spark reconstructs partition
        # columns from the directory names under basePath.
        full = StructType(
            list(read_schema.fields)
            + [f for f in logical.fields if f.name in part_cols]
        )
        df = _with_dv_meta(
            spark.read.schema(full)
            .option("basePath", table_path)
            .parquet(*[_abs(a["path"]) for a in adds])
        )
    else:
        # group by partition tuple; literal columns per group.
        # add.partitionValues keys are PHYSICAL names in mapping mode.
        groups: dict[tuple, list[str]] = {}
        for a in adds:
            pv = a.get("partitionValues") or {}
            key = tuple(pv.get(phys_of[c]) for c in part_cols)
            groups.setdefault(key, []).append(_abs(a["path"]))
        parts_struct = {f.name: f.dataType for f in logical.fields}
        df = None
        # None-safe ordering: a null partition value (valid per the
        # protocol) must not crash the sort against strings.
        for key, paths in sorted(
            groups.items(),
            key=lambda kv: tuple((v is None, v or "") for v in kv[0]),
        ):
            g = _with_dv_meta(
                spark.read.schema(read_schema).parquet(*paths)
            )
            for c, v in zip(part_cols, key):
                g = g.withColumn(
                    phys_of[c],
                    F.lit(v).cast(parts_struct[c]),
                )
            df = g if df is None else df.unionByName(g)
    if dv_adds:
        df = _apply_deletion_vectors(spark, table_path, df, dv_adds, _abs)
    if rename:
        for phys, logic in rename.items():
            if phys != logic:
                df = df.withColumnRenamed(phys, logic)
    if rename and not id_mode:
        # name mode: nested fields still carry physical names after
        # the top-level rename — a positional cast to the logical type
        # restores logical names at every nesting level (types are
        # identical, so the cast is a pure rename). id mode reads
        # logical names natively via field-id matching.
        return df.select(
            *[
                F.col(f.name).cast(f.dataType).alias(f.name)
                for f in logical.fields
            ]
        )
    return df.select(*[f.name for f in logical.fields])


def _apply_deletion_vectors(spark, table_path, df, dv_adds, abs_of):
    """Anti-join the deleted (file, row_index) pairs out of the scan.

    Descriptors resolve DRIVER-side to the serialized bitmap bytes
    (O(sum of compressed DV sizes) — KBs per million deleted rows);
    the bitmaps are EXPANDED to row indexes in executors (one task per
    DV file via mapInPandas), so a billion-row tombstone set never
    materializes on the driver. The join is the same
    (_metadata.file_path, row_index) anti-join the Iceberg reader uses
    for position deletes; AQE picks broadcast when the expanded set is
    small."""
    import pandas as pd

    from pyspark.sql import functions as F

    from kafka_delta_ingest_spark.roaring import (
        deserialize_rbm_array,
        dv_descriptor_bytes,
    )

    spec = [
        (abs_of(a["path"]),
         bytearray(dv_descriptor_bytes(table_path, a["deletionVector"])))
        for a in dv_adds
    ]
    # One slice per DV file (capped), built at parallelize time: the
    # plain createDataFrame(list) splits even a 1-row spec across
    # defaultParallelism empty slices and the old repartition added a
    # shuffle on top — one near-empty 32-task stage per read.
    spec_rdd = spark.sparkContext.parallelize(
        spec, max(1, min(len(spec), 64))
    )
    spec_df = spark.createDataFrame(spec_rdd, "fp string, dv binary")

    def expand(batches):
        for pdf in batches:
            for fp, dv in zip(pdf["fp"], pdf["dv"]):
                pos = deserialize_rbm_array(bytes(dv))
                yield pd.DataFrame({"_dv_fp": fp, "_dv_pos": pos})

    dels = spec_df.mapInPandas(expand, "_dv_fp string, _dv_pos long")
    # The static planner has no size estimate for a mapInPandas
    # output, so without a hint the anti-join plans as a 32-partition
    # shuffle join and AQE can only fix it after both sides shuffled.
    # Gate the hint on the DECODED cardinality, not serialized bytes:
    # a run container packs up to 65,536 positions into 4 payload
    # bytes, so a <=256 KiB run-encoded DV (dense contiguous deletes,
    # what runOptimize-style writers produce) can expand to billions
    # of (file, pos) rows — F.broadcast would force-build that as a
    # hash relation and OOM. The descriptor headers carry each
    # container's cardinality, so the driver-side walk is O(headers)
    # with no value materialization; <=131,072 positions (~2 MiB of
    # hashed-relation rows at ~16 B/pos) broadcasts, anything larger
    # keeps the shuffle plan (scale: a billion-row DV never
    # broadcasts).
    from kafka_delta_ingest_spark.roaring import rbm_array_cardinality

    if sum(
        rbm_array_cardinality(bytes(dv)) for _fp, dv in spec
    ) <= 131_072:
        dels = F.broadcast(dels)
    cond = (F.col("_kdi_fp") == F.col("_dv_fp")) & (
        F.col("_kdi_pos") == F.col("_dv_pos")
    )
    return df.join(dels, cond, "left_anti").drop("_kdi_fp", "_kdi_pos")


class DeltaFixtureWriter:
    """Hand-writes the STANDARD Delta layout (``_delta_log`` JSON
    commits, hive-style data paths, a parquet checkpoint) from the
    public protocol spec, via pyarrow — so ``read_delta`` is certified
    against a table this repo's sink did not produce. Not a production
    writer."""

    def __init__(self, table_path: str, schema_struct,
                 partition_cols: list[str] | None = None,
                 configuration: dict | None = None):
        self.root = table_path
        self.log = os.path.join(table_path, _LOG)
        os.makedirs(self.log, exist_ok=True)
        self.schema = schema_struct
        self.parts = list(partition_cols or [])
        self.conf = dict(configuration or {})
        self.version = -1
        self._file_no = 0
        self._committed_meta = False

    def _meta_action(self) -> dict:
        return {
            "metaData": {
                "id": "11111111-2222-3333-4444-555555555555",
                "format": {"provider": "parquet", "options": {}},
                "schemaString": json.dumps(self.schema.jsonValue()),
                "partitionColumns": self.parts,
                "configuration": self.conf,
                "createdTime": 1700000000000,
            }
        }

    def _commit(self, actions: list[dict], operation: str,
                timestamp_ms: int) -> int:
        self.version += 1
        head = [
            {
                "commitInfo": {
                    "operation": operation,
                    "timestamp": timestamp_ms,
                }
            }
        ]
        if not self._committed_meta:
            head.append({"protocol": {"minReaderVersion": 1,
                                      "minWriterVersion": 2}})
            head.append(self._meta_action())
            self._committed_meta = True
        with open(
            os.path.join(self.log, f"{self.version:020d}.json"), "w"
        ) as f:
            for a in head + actions:
                f.write(json.dumps(a) + "\n")
        return self.version

    def add_files(self, groups: list[tuple[dict, list[dict]]],
                  timestamp_ms: int, physical_names: dict | None = None,
                  field_ids: dict | None = None) -> int:
        """groups: (partitionValues dict, rows) per data file; rows use
        LOGICAL column names, ``physical_names`` maps logical→physical
        for column-mapping fixtures, ``field_ids`` maps logical name →
        parquet field id (id-mode fixtures: columns are written under
        physical names WITH ``PARQUET:field_id`` metadata)."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        actions = []
        for pv, rows in groups:
            self._file_no += 1
            subdir = "/".join(f"{k}={v}" for k, v in pv.items())
            rel = (subdir + "/" if subdir else "") + (
                f"part-{self._file_no:05d}.parquet"
            )
            full = os.path.join(self.root, rel)
            os.makedirs(os.path.dirname(full), exist_ok=True)
            names = physical_names or {}
            cols = [c for c in rows[0] if c not in pv]
            arrays = {
                names.get(c, c): pa.array([r[c] for r in rows])
                for c in cols
            }
            if field_ids:
                schema = pa.schema(
                    [
                        pa.field(
                            names.get(c, c),
                            arrays[names.get(c, c)].type,
                            metadata={
                                b"PARQUET:field_id":
                                    str(field_ids[c]).encode()
                            },
                        )
                        for c in cols
                    ]
                )
                table = pa.table(arrays, schema=schema)
            else:
                table = pa.table(arrays)
            pq.write_table(table, full)
            actions.append(
                {
                    "add": {
                        "path": rel,
                        "partitionValues": {k: str(v)
                                            for k, v in pv.items()},
                        "size": os.path.getsize(full),
                        "modificationTime": timestamp_ms,
                        "dataChange": True,
                    }
                }
            )
        return self._commit(actions, "WRITE", timestamp_ms)

    def _live_adds(self) -> dict[str, dict]:
        """path → current add action, one pass over the JSON log."""
        adds: dict[str, dict] = {}
        for v in _commit_versions(self.log):
            with open(os.path.join(self.log, f"{v:020d}.json")) as f:
                for line in f:
                    act = json.loads(line)
                    if "add" in act:
                        adds[act["add"]["path"]] = act["add"]
                    elif "remove" in act:
                        _reconcile_remove(adds, act["remove"])
        return adds

    def _live_add(self, rel_path: str) -> dict | None:
        """The path's current add action from own (JSON-only) log."""
        return self._live_adds().get(rel_path)

    def _remove_actions(self, rel_paths: list[str], timestamp_ms: int,
                        data_change: bool = True) -> list[dict]:
        # carry each live add's DV so (path, dv uid) reconciliation
        # tombstones the right entry — ONE log pass for the batch
        live = self._live_adds()
        out = []
        for p in rel_paths:
            r = {
                "path": p,
                "deletionTimestamp": timestamp_ms,
                "dataChange": data_change,
            }
            dv = (live.get(p) or {}).get("deletionVector")
            if dv:
                r["deletionVector"] = dv
            out.append({"remove": r})
        return out

    def remove_files(self, rel_paths: list[str], timestamp_ms: int) -> int:
        actions = self._remove_actions(rel_paths, timestamp_ms)
        return self._commit(actions, "DELETE", timestamp_ms)

    def commit_with_cdc(self, remove_rel_paths: list[str],
                        cdc_rows: list[dict], timestamp_ms: int) -> int:
        """A DML commit carrying an explicit ``cdc`` action: the
        change rows (each with a ``_change_type``) go to a parquet
        under ``_change_data/`` and the commit lists removes + the
        cdc file — the shape delta-spark emits when CDF is enabled."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        cd_dir = os.path.join(self.root, "_change_data")
        os.makedirs(cd_dir, exist_ok=True)
        self._file_no += 1
        rel = f"_change_data/cdc-{self._file_no:05d}.parquet"
        cols = list(cdc_rows[0].keys())
        pq.write_table(
            pa.table({c: [r[c] for r in cdc_rows] for c in cols}),
            os.path.join(self.root, rel),
        )
        actions = self._remove_actions(remove_rel_paths, timestamp_ms)
        actions.append(
            {
                "cdc": {
                    "path": rel,
                    "partitionValues": {},
                    "size": os.path.getsize(
                        os.path.join(self.root, rel)
                    ),
                    "dataChange": False,
                }
            }
        )
        return self._commit(actions, "DELETE", timestamp_ms)

    def delete_rows(self, rel_path: str, positions: list[int],
                    timestamp_ms: int) -> int:
        """Row-level DELETE via a real deletion vector: writes a
        ``deletion_vector_<uuid>.bin`` (roaring bitmap array, framed +
        CRC per the protocol), then commits remove(old add) + the same
        add re-added with a ``u``-type deletionVector descriptor —
        exactly what delta-spark's DV DELETE emits. Cumulative: an
        existing DV's rows are unioned in (the new descriptor must
        cover ALL deleted rows of the file)."""
        import uuid as _uuid

        from kafka_delta_ingest_spark.roaring import (
            deserialize_rbm_array,
            dv_descriptor_bytes,
            write_dv_file,
            z85_encode,
        )

        # find the file's current add action in own (JSON-only) log
        cur = self._live_add(rel_path)
        if cur is None:
            raise ValueError(f"{rel_path} is not a live file")
        all_pos = set(positions)
        if cur.get("deletionVector"):
            all_pos |= set(
                deserialize_rbm_array(
                    dv_descriptor_bytes(self.root, cur["deletionVector"])
                )
            )
        u = _uuid.uuid4()
        metas = write_dv_file(
            os.path.join(self.root, f"deletion_vector_{u}.bin"),
            [sorted(all_pos)],
        )
        new_add = dict(cur)
        new_add["deletionVector"] = {
            "storageType": "u",
            "pathOrInlineDv": z85_encode(u.bytes),
            "offset": metas[0]["offset"],
            "sizeInBytes": metas[0]["sizeInBytes"],
            "cardinality": metas[0]["cardinality"],
        }
        new_add["dataChange"] = False
        old_dv = (
            {"deletionVector": cur["deletionVector"]}
            if cur.get("deletionVector") else {}
        )
        actions = [
            {
                "remove": {
                    "path": rel_path,
                    "deletionTimestamp": timestamp_ms,
                    "dataChange": False,
                    **old_dv,
                }
            },
            {"add": new_add},
        ]
        return self._commit(actions, "DELETE", timestamp_ms)

    def checkpoint(self, tombstones: list | None = None) -> None:
        """Consolidate current state into a checkpoint parquet +
        ``_last_checkpoint`` pointer (protocol layout: one action per
        row, struct columns). ``tombstones`` adds remove rows — each a
        rel path (str) or a full remove-action dict (real checkpoints
        retain recent removes for VACUUM, INCLUDING dv-less tombstones
        for paths whose live add now carries a DV; a reader must
        reconcile on (path, dv uid), not path)."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        # replay own log (py-side) to the live state
        adds: dict[str, dict] = {}
        meta = None
        protocol = None
        for v in _commit_versions(self.log):
            with open(os.path.join(self.log, f"{v:020d}.json")) as f:
                for line in f:
                    act = json.loads(line)
                    if "metaData" in act:
                        meta = act["metaData"]
                    elif "protocol" in act:
                        protocol = act["protocol"]
                    elif "add" in act:
                        adds[act["add"]["path"]] = act["add"]
                    elif "remove" in act:
                        _reconcile_remove(adds, act["remove"])
        rows = [{"protocol": protocol, "metaData": meta, "add": None,
                 "remove": None}]
        rows += [{"protocol": None, "metaData": None, "add": a,
                  "remove": None} for a in adds.values()]
        rows += [
            {"protocol": None, "metaData": None, "add": None,
             "remove": (
                 t if isinstance(t, dict)
                 else {"path": t, "deletionTimestamp": 0,
                       "dataChange": True}
             )}
            for t in (tombstones or [])
        ]
        map_ss = pa.map_(pa.string(), pa.string())
        dv_struct = pa.struct(
            [("storageType", pa.string()),
             ("pathOrInlineDv", pa.string()),
             ("offset", pa.int32()),
             ("sizeInBytes", pa.int32()),
             ("cardinality", pa.int64())]
        )
        cp_schema = pa.schema(
            [
                ("protocol", pa.struct(
                    [("minReaderVersion", pa.int32()),
                     ("minWriterVersion", pa.int32())]
                )),
                ("metaData", pa.struct(
                    [("id", pa.string()),
                     ("format", pa.struct(
                         [("provider", pa.string()),
                          ("options", map_ss)]
                     )),
                     ("schemaString", pa.string()),
                     ("partitionColumns", pa.list_(pa.string())),
                     ("configuration", map_ss),
                     ("createdTime", pa.int64())]
                )),
                ("add", pa.struct(
                    [("path", pa.string()),
                     ("partitionValues", map_ss),
                     ("size", pa.int64()),
                     ("modificationTime", pa.int64()),
                     ("dataChange", pa.bool_()),
                     ("deletionVector", dv_struct)]
                )),
                ("remove", pa.struct(
                    [("path", pa.string()),
                     ("deletionTimestamp", pa.int64()),
                     ("dataChange", pa.bool_()),
                     ("deletionVector", dv_struct)]
                )),
            ]
        )
        table = pa.Table.from_pylist(rows, schema=cp_schema)
        path = os.path.join(
            self.log, f"{self.version:020d}.checkpoint.parquet"
        )
        pq.write_table(table, path)
        with open(os.path.join(self.log, "_last_checkpoint"), "w") as f:
            json.dump({"version": self.version, "size": len(rows)}, f)

    def checkpoint_v2(self, fmt: str = "json") -> None:
        """V2 checkpoint: a UUID-named top-level manifest
        (``%020d.checkpoint.<uuid>.{json,parquet}``) holding
        protocol/metaData + a ``sidecar`` action, with the add/remove
        actions in a parquet sidecar under ``_delta_log/_sidecars/``
        — the layout tables with the ``v2Checkpoint`` feature write."""
        import uuid as _uuid

        import pyarrow as pa
        import pyarrow.parquet as pq

        # replay own log to live state (same as checkpoint())
        adds: dict[str, dict] = {}
        meta = None
        protocol = None
        for v in _commit_versions(self.log):
            with open(os.path.join(self.log, f"{v:020d}.json")) as f:
                for line in f:
                    act = json.loads(line)
                    if "metaData" in act:
                        meta = act["metaData"]
                    elif "protocol" in act:
                        protocol = act["protocol"]
                    elif "add" in act:
                        adds[act["add"]["path"]] = act["add"]
                    elif "remove" in act:
                        _reconcile_remove(adds, act["remove"])
        sc_dir = os.path.join(self.log, "_sidecars")
        os.makedirs(sc_dir, exist_ok=True)
        sc_name = f"{_uuid.uuid4().hex}.parquet"
        map_ss = pa.map_(pa.string(), pa.string())
        sc_schema = pa.schema(
            [
                ("add", pa.struct(
                    [("path", pa.string()),
                     ("partitionValues", map_ss),
                     ("size", pa.int64()),
                     ("modificationTime", pa.int64()),
                     ("dataChange", pa.bool_())]
                )),
                ("remove", pa.struct(
                    [("path", pa.string()),
                     ("deletionTimestamp", pa.int64()),
                     ("dataChange", pa.bool_())]
                )),
            ]
        )
        sc_rows = [{"add": a, "remove": None} for a in adds.values()]
        pq.write_table(
            pa.Table.from_pylist(sc_rows, schema=sc_schema),
            os.path.join(sc_dir, sc_name),
        )
        sidecar = {
            "path": sc_name,
            "sizeInBytes": os.path.getsize(os.path.join(sc_dir, sc_name)),
            "modificationTime": 1700000000000,
        }
        u = _uuid.uuid4().hex
        proto = protocol or {"minReaderVersion": 3, "minWriterVersion": 7}
        if fmt == "json":
            manifest = os.path.join(
                self.log, f"{self.version:020d}.checkpoint.{u}.json"
            )
            with open(manifest, "w") as f:
                f.write(json.dumps({"protocol": proto}) + "\n")
                f.write(json.dumps({"metaData": meta}) + "\n")
                f.write(json.dumps({"sidecar": sidecar}) + "\n")
        else:
            man_schema = pa.schema(
                [
                    ("protocol", pa.struct(
                        [("minReaderVersion", pa.int32()),
                         ("minWriterVersion", pa.int32())]
                    )),
                    ("metaData", pa.struct(
                        [("id", pa.string()),
                         ("format", pa.struct(
                             [("provider", pa.string()),
                              ("options", map_ss)]
                         )),
                         ("schemaString", pa.string()),
                         ("partitionColumns", pa.list_(pa.string())),
                         ("configuration", map_ss),
                         ("createdTime", pa.int64())]
                    )),
                    ("sidecar", pa.struct(
                        [("path", pa.string()),
                         ("sizeInBytes", pa.int64()),
                         ("modificationTime", pa.int64())]
                    )),
                ]
            )
            rows = [
                {"protocol": proto, "metaData": meta, "sidecar": None},
                {"protocol": None, "metaData": None, "sidecar": sidecar},
            ]
            pq.write_table(
                pa.Table.from_pylist(rows, schema=man_schema),
                os.path.join(
                    self.log, f"{self.version:020d}.checkpoint.{u}.parquet"
                ),
            )
        with open(os.path.join(self.log, "_last_checkpoint"), "w") as f:
            json.dump({"version": self.version, "v2": True}, f)


class DeltaStandardWriter:
    """Standard-layout Delta Lake WRITER: emits a real ``_delta_log``
    (JSON commits, protocol/metaData actions, add-action stats,
    partition values, periodic parquet checkpoint + ``_last_checkpoint``)
    so this engine's OUTPUT is consumable by delta-spark / delta-rs /
    any protocol-conformant reader — the reference daemon's core
    interop property (README.adoc:3-5, src/delta_helpers.rs:15-40),
    which the repo's ``_kdi_log`` sink (sinks/delta_like.py) does not
    provide on its own.

    Protocol conformance (PROTOCOL.md):

    * atomic commits: ``%020d.json`` claimed with O_CREAT|O_EXCL — the
      protocol's put-if-absent primitive — with retry on version race
      (blind appends never conflict under WriteSerializable);
    * first commit carries ``protocol`` (minReader 1 / minWriter 2)
      and ``metaData`` (Spark StructType schemaString, partition
      columns, table id);
    * add actions carry ``partitionValues`` (string map, null for
      ``__HIVE_DEFAULT_PARTITION__``), size, modificationTime,
      dataChange, and a ``stats`` JSON string (numRecords, minValues,
      maxValues, nullCount from the parquet footers — the same stats
      the reference writes, src/writer.rs:657-1076) so downstream
      readers data-skip;
    * ``mode="overwrite"`` commits remove actions for every previously
      live file in the same atomic commit;
    * every ``checkpoint_every`` (default 10, the reference's cadence)
      commits, a single-part parquet checkpoint of the reconciled
      state is written plus the ``_last_checkpoint`` pointer.

    Data files are written by SPARK (one executor-parallel job into a
    staging dir, then promoted under the table root) — the writer
    itself only handles metadata, so write throughput scales with the
    cluster exactly like any parquet write. Certification reads the
    result back through the independent :func:`read_delta` replay path
    (tests + the ``sink_delta_standard_roundtrip`` driver query).
    """

    def __init__(self, table_path: str, checkpoint_every: int = 10,
                 enable_cdf: bool = False, store=None):
        """``enable_cdf`` stamps ``delta.enableChangeDataFeed=true``
        into the first commit's metaData configuration (delta-spark's
        table property); with CDF on, :meth:`delete_where` also writes
        the deleted rows as ``_change_data/`` cdc parquet + a ``cdc``
        action, so ``table_changes`` serves the DV DELETE's change set
        exactly (without CDF a DV delete's changes are underivable
        from the log — the read side raises).

        ``store`` injects a :class:`~kafka_delta_ingest_spark.logstore
        .LogStore` for the commit-protocol IO (claims, conflict scans,
        checkpoint publishes); default resolves from the table URI —
        local disk here, with the object-store contract documented in
        logstore.py."""
        from kafka_delta_ingest_spark.logstore import get_log_store

        self.root = table_path
        self.log = os.path.join(table_path, _LOG)
        self.store = store or get_log_store(table_path)
        self.store.makedirs(self.log)
        self.checkpoint_every = checkpoint_every
        self.enable_cdf = enable_cdf

    def _cdf_enabled(self, meta: dict | None) -> bool:
        conf = (meta or {}).get("configuration") or {}
        return conf.get("delta.enableChangeDataFeed") == "true"

    # -- state ---------------------------------------------------------

    def latest_version(self) -> int:
        versions = [
            int(f[:20])
            for f in self.store.list_dir(self.log)
            if f.endswith(".json") and f[:20].isdigit() and len(f) == 25
        ]
        return max(versions) if versions else -1

    def _py_replay(self, target: int | None = None) -> dict:
        """Driver-side replay of own log (checkpoint-aware) to
        ``target`` (default: latest) — used for overwrite remove-sets,
        txn ledger lookups, RESTORE diffs, and checkpoint
        consolidation. O(live files) memory, the same model delta-rs
        uses when checkpointing."""
        adds: dict[str, dict] = {}
        txn: dict[str, int] = {}
        meta = None
        protocol = None
        start = 0
        if target is None:
            target = self.latest_version()
        if target < 0:
            return {"adds": adds, "meta": meta, "protocol": protocol,
                    "txn": txn}
        cp = _best_checkpoint(self.log, target, self.store)
        if cp is not None:
            import io as _io

            import pyarrow.parquet as pq

            for f in _checkpoint_files(self.log, cp, self.store):
                for row in pq.read_table(
                    _io.BytesIO(self.store.read_bytes(f))
                ).to_pylist():
                    if row.get("metaData") and row["metaData"].get("id"):
                        meta = row["metaData"]
                    if row.get("protocol") and row["protocol"].get(
                        "minReaderVersion"
                    ):
                        protocol = row["protocol"]
                    a = row.get("add")
                    if a and a.get("path"):
                        adds[a["path"]] = a
                    r = row.get("remove")
                    if r and r.get("path"):
                        _reconcile_remove(adds, r)
                    t = row.get("txn")
                    if t and t.get("appId"):
                        txn[t["appId"]] = t["version"]
            start = cp + 1
        for v in _commit_versions(self.log, self.store):
            if v < start or v > target:
                continue
            body = self.store.read_bytes(
                os.path.join(self.log, f"{v:020d}.json")
            ).decode()
            for line in body.splitlines():
                    line = line.strip()
                    if not line:
                        continue
                    act = json.loads(line)
                    if "metaData" in act:
                        meta = act["metaData"]
                    elif "protocol" in act:
                        protocol = act["protocol"]
                    elif "add" in act:
                        adds[act["add"]["path"]] = act["add"]
                    elif "remove" in act:
                        _reconcile_remove(adds, act["remove"])
                    elif "txn" in act:
                        txn[act["txn"]["appId"]] = act["txn"]["version"]
        return {"adds": adds, "meta": meta, "protocol": protocol,
                "txn": txn}

    # safe implicit upcasts on write (delta-spark's ANSI store
    # assignment): the frame value range embeds in the table type
    _SAFE_UPCASTS = {
        ("byte", "short"), ("byte", "integer"), ("byte", "long"),
        ("short", "integer"), ("short", "long"),
        ("integer", "long"),
        ("float", "double"),
    }

    @staticmethod
    def _conform_frame(df, meta: dict):
        """Refuse writes whose frame drifts from the committed
        ``metaData.schemaString``: a frame column the table does not
        declare, or a shared column at an incompatible type, lands
        parquet bytes every protocol reader then silently misdecodes
        (new columns null out, retyped columns corrupt). Safe numeric
        upcasts are applied to the frame (delta-spark's implicit ANSI
        store assignment); a frame may OMIT nullable table columns
        (they read back as null — standard Delta append semantics).
        Widening the table is an explicit :meth:`evolve_schema`
        commit, never an implicit side effect — the reference's
        update_schema contract (src/writer.rs:370-387,
        tests/schema_update_tests.rs:23-113). Returns the (possibly
        cast) frame."""
        from pyspark.sql import functions as F

        stored_fields = json.loads(meta["schemaString"])["fields"]
        stored = {f["name"]: f["type"] for f in stored_fields}
        frame_fields = json.loads(df.schema.json())["fields"]
        frame_names = {f["name"] for f in frame_fields}
        required_missing = sorted(
            f["name"]
            for f in stored_fields
            if not f.get("nullable", True)
            and f["name"] not in frame_names
        )
        if required_missing:
            raise ValueError(
                f"frame omits non-nullable table column(s) "
                f"{required_missing}; only nullable columns may be "
                "omitted (they read back as null)"
            )
        cols = []
        needs_cast = False
        for f in frame_fields:
            name = f["name"]
            if name not in stored:
                raise ValueError(
                    f"column {name!r} is not in the table schema; "
                    "call evolve_schema() first (appends never evolve "
                    "the schema implicitly)"
                )
            # nullability-relaxed comparison on BOTH sides: a frame's
            # incidental non-null struct/array/map flags must not read
            # as a type change against the (normalized) stored schema
            if _relax_type(stored[name]) == _relax_type(f["type"]):
                cols.append(F.col(name))
            elif (
                isinstance(f["type"], str)
                and isinstance(stored[name], str)
                and (f["type"], stored[name])
                in DeltaStandardWriter._SAFE_UPCASTS
            ):
                needs_cast = True
                cols.append(F.col(name).cast(stored[name]).alias(name))
            else:
                raise ValueError(
                    f"column {name!r}: frame type {f['type']!r} != "
                    f"table type {stored[name]!r}; type changes "
                    "require a rewrite"
                )
        return df.select(*cols) if needs_cast else df

    def evolve_schema(self, schema) -> int:
        """Commit a new ``metaData`` action widening the table schema
        (ALTER TABLE ADD COLUMNS analog) — ADD-ONLY, like the kdi
        sink's evolve_schema (sinks/delta_like.py): existing columns
        must keep their exact types and none may be omitted, so old
        files stay readable (missing new columns read as null) and no
        name can silently resurrect stale bytes. Returns the committed
        version (current version if the schema is already identical)."""
        import time

        read_v = self.latest_version()
        state = self._py_replay(target=read_v if read_v >= 0 else None)
        if state["meta"] is None:
            raise ValueError("evolve_schema on an empty table — the "
                             "first write() declares the schema")
        old_fields = json.loads(state["meta"]["schemaString"])["fields"]
        old_by_name = {f["name"]: f for f in old_fields}
        new_fields = json.loads(schema.json())["fields"]
        new_names = {f["name"] for f in new_fields}
        for f in new_fields:
            old = old_by_name.get(f["name"])
            if old is not None and _relax_type(old["type"]) != _relax_type(
                f["type"]
            ):
                raise ValueError(
                    f"column {f['name']!r}: type change "
                    f"{old['type']!r} -> {f['type']!r} cannot "
                    "be applied to already-written files"
                )
        missing = sorted(n for n in old_by_name if n not in new_names)
        if missing:
            raise ValueError(
                f"evolved schema omits existing column(s) {missing}; "
                "schema evolution is add-only"
            )
        for c in state["meta"].get("partitionColumns") or []:
            if c not in new_names:
                raise ValueError(
                    f"evolved schema omits partition column {c!r}"
                )
        # EXISTING columns keep their stored field json verbatim
        # (incl. explicit NOT NULL from external writers — evolution
        # must never silently relax a constraint); only NEW columns
        # get the nullable normalization.
        merged_fields = [
            old_by_name[f["name"]]
            if f["name"] in old_by_name
            else {**f, "nullable": True,
                  "type": _relax_type(f["type"])}
            for f in new_fields
        ]
        new_schema_str = json.dumps(
            {"type": "struct", "fields": merged_fields}
        )
        if json.loads(new_schema_str) == json.loads(
            state["meta"]["schemaString"]
        ):
            return read_v
        now_ms = int(time.time() * 1000)
        new_meta = dict(state["meta"])
        new_meta["schemaString"] = new_schema_str
        version = self._atomic_commit(
            [
                {
                    "commitInfo": {
                        "operation": "ADD COLUMNS",
                        "operationParameters": {},
                        "timestamp": now_ms,
                    }
                },
                {"metaData": new_meta},
            ],
            # concurrent APPENDS are fine under add-only widening;
            # a concurrent metadata change raises (checked always)
            read_version=read_v,
        )
        if version > 0 and version % self.checkpoint_every == 0:
            self._write_checkpoint(version)
        return version

    def txn_version(self, app_id: str) -> int | None:
        """Highest committed ``txn`` version for ``app_id`` — the
        Delta protocol's application-transaction ledger (what the
        reference stores per-Kafka-partition offsets in,
        src/delta_helpers.rs:15-40)."""
        return self._py_replay()["txn"].get(app_id)

    # -- commit primitive ----------------------------------------------

    def _atomic_commit(
        self,
        actions: list[dict],
        attempts: int = 100,
        read_version: int | None = None,
        read_files: set[str] | None = None,
        conflict_on_any_change: bool = False,
        txn: dict[str, int] | None = None,
    ) -> int:
        """Claim the next version via O_CREAT|O_EXCL and write the
        payload — with the reference's optimistic-concurrency CONFLICT
        CHECK (src/lib.rs:948-1024): when the action set was derived
        from a snapshot (``read_version``), every commit that landed
        after that snapshot is inspected before claiming:

        * ``conflict_on_any_change`` (overwrite/restore — ops whose
          read set is the whole table): ANY intervening data or
          metadata action raises :class:`ConcurrentDeltaWriteError`;
        * ``read_files`` (delete_where/optimize — ops that rewrite
          specific files): an intervening add/remove touching one of
          those paths, or a metaData/protocol change, raises; blind
          appends of NEW files rebase silently (WriteSerializable);
        * ``txn``: if an intervening commit already carried every
          appId at-or-beyond its version (another worker won the
          race with the SAME batch), the commit is SKIPPED and the
          current version returned — exactly-once under races.

        Blind appends (no read_version) retry unconditionally: they
        are serializable against anything by construction.

        The claim itself is ``LogStore.put_if_absent`` of the FULLY
        built payload onto the version name — put-if-absent WITH
        content, never create-then-write: a racer's conflict check (or
        any reader) can never observe a claimed-but-empty commit file.
        (Local backend: hard-link-from-temp; object stores: one
        conditional PUT — see logstore.py.)"""
        payload = (
            "\n".join(json.dumps(a) for a in actions) + "\n"
        ).encode()
        checked_through = read_version
        for _ in range(attempts):
            version = self.latest_version() + 1
            if (
                checked_through is not None
                and version > checked_through + 1
            ):
                if txn:
                    stored = self._py_replay(
                        target=version - 1
                    )["txn"]
                    if all(
                        app in stored and stored[app] >= ver
                        for app, ver in txn.items()
                    ):
                        return version - 1  # replay — racer won
                self._raise_on_conflict(
                    checked_through + 1, version - 1,
                    read_files, conflict_on_any_change,
                )
                checked_through = version - 1
            if self.store.put_if_absent(
                os.path.join(self.log, f"{version:020d}.json"),
                payload,
            ):
                return version
            # another writer claimed this version — retry
        raise RuntimeError("exhausted commit attempts (version race)")

    def _raise_on_conflict(
        self,
        lo: int,
        hi: int,
        read_files: set[str] | None,
        conflict_on_any_change: bool,
    ) -> None:
        for v in range(lo, hi + 1):
            path = os.path.join(self.log, f"{v:020d}.json")
            if not self.store.exists(path):
                continue
            for line in self.store.read_bytes(path).decode().splitlines():
                    line = line.strip()
                    if not line:
                        continue
                    act = json.loads(line)
                    if "metaData" in act or "protocol" in act:
                        raise ConcurrentDeltaWriteError(
                            f"version {v} changed table metadata after "
                            "this operation's snapshot"
                        )
                    hit = None
                    if "add" in act:
                        hit = act["add"]["path"]
                    elif "remove" in act:
                        hit = act["remove"]["path"]
                    if hit is None:
                        continue
                    if conflict_on_any_change:
                        raise ConcurrentDeltaWriteError(
                            f"version {v} committed a data change "
                            "after this operation's whole-table "
                            "snapshot"
                        )
                    if read_files is not None and hit in read_files:
                        raise ConcurrentDeltaWriteError(
                            f"version {v} touched {hit!r}, which this "
                            "operation read and rewrites"
                        )

    # -- write ----------------------------------------------------------

    def write(
        self,
        df,
        mode: str = "append",
        partition_by: list[str] | None = None,
        txn: dict[str, int] | None = None,
    ) -> int:
        """Write ``df`` as one atomic Delta commit; returns the version.

        ``mode="append"`` adds files; ``mode="overwrite"`` additionally
        removes every previously-live file in the same commit.

        ``txn`` maps appId → version (the protocol's application
        transaction action — e.g. one appId per Kafka partition,
        carrying its high offset). If EVERY supplied appId is already
        at-or-beyond its version in the log, the write is SKIPPED and
        the current version returned — idempotent replay, the
        reference's exactly-once mechanism (src/offsets.rs:36-102,
        src/lib.rs:1087-1100) on the standard log layout."""
        import shutil
        import time
        import uuid

        from kafka_delta_ingest_spark.sinks.delta_like import (
            _parquet_stats,
            _parse_partition_values,
        )

        if mode not in ("append", "overwrite"):
            raise ValueError(f"unsupported mode {mode!r}")
        txn = dict(txn or {})
        read_v = self.latest_version()  # -1 on a brand-new table: the
        # conflict/replay checks then cover EVERY commit that lands
        # before ours, incl. a racer bootstrapping the same first batch
        state = self._py_replay(target=read_v)
        if txn:
            stored = state["txn"]
            if all(
                app in stored and stored[app] >= ver
                for app, ver in txn.items()
            ):
                return read_v  # replay — already applied
        if state["meta"] is not None:
            df = self._conform_frame(df, state["meta"])
            self._enforce_constraints(df, state["meta"])
            declared = state["meta"].get("partitionColumns") or []
            if partition_by is None:
                partition_by = list(declared)
            elif list(partition_by) != list(declared):
                raise ValueError(
                    f"partition_by {partition_by} != table's declared "
                    f"partitioning {declared}"
                )
        partition_by = list(partition_by or [])

        now_ms = int(time.time() * 1000)
        adds = self._stage_adds(df, partition_by, now_ms)
        if not adds and mode == "append":
            return self.latest_version()  # empty append never commits

        actions: list[dict] = [
            {
                "commitInfo": {
                    "operation": (
                        "WRITE" if mode == "append" else "OVERWRITE"
                    ),
                    "operationParameters": {
                        "mode": mode.capitalize(),
                        "partitionBy": json.dumps(partition_by),
                    },
                    "timestamp": now_ms,
                }
            }
        ]
        if state["meta"] is None:
            actions.append(
                {
                    "protocol": {
                        "minReaderVersion": 1,
                        "minWriterVersion": 2,
                    }
                }
            )
            actions.append(
                {
                    "metaData": {
                        "id": str(uuid.uuid4()),
                        "format": {"provider": "parquet", "options": {}},
                        "schemaString": _nullable_schema_json(
                            df.schema
                        ),
                        "partitionColumns": partition_by,
                        "configuration": (
                            {"delta.enableChangeDataFeed": "true"}
                            if self.enable_cdf else {}
                        ),
                        "createdTime": now_ms,
                    }
                }
            )
        if mode == "overwrite":
            # removes carry the superseded add's DV descriptor — the
            # protocol keys reconciliation on (path, dv uid), so a
            # dv-less remove would fail to tombstone a DV-carrying add
            actions += [
                {
                    "remove": {
                        "path": p,
                        "deletionTimestamp": now_ms,
                        "dataChange": True,
                        **(
                            {"deletionVector": a["deletionVector"]}
                            if a.get("deletionVector") else {}
                        ),
                    }
                }
                for p, a in state["adds"].items()
            ]
        actions += [
            {"txn": {"appId": a, "version": v, "lastUpdated": now_ms}}
            for a, v in sorted(txn.items())
        ]
        actions += [{"add": a} for a in adds]
        version = self._atomic_commit(
            actions,
            read_version=read_v,
            conflict_on_any_change=(mode == "overwrite"),
            txn=txn or None,
        )
        if version > 0 and version % self.checkpoint_every == 0:
            self._write_checkpoint(version)
        return version

    def _stage_adds(
        self, df, partition_by: list[str] | None, now_ms: int
    ) -> list[dict]:
        """Write ``df`` executor-parallel into a staging dir, promote
        the parquet under the table root (hive layout when
        partitioned), and return the add-action dicts with
        footer-derived stats. Shared by write / update_where / merge —
        the data path is always one Spark job; only metadata is
        driver-side."""
        import shutil
        import uuid

        from kafka_delta_ingest_spark.sinks.delta_like import (
            _parquet_stats,
            _parse_partition_values,
        )

        staging = os.path.join(self.root, f"_staging-{uuid.uuid4().hex}")
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(staging)

        adds = []
        for dirpath, _dirs, files in os.walk(staging):
            rel = os.path.relpath(dirpath, staging)
            rel_dir = "" if rel == "." else rel
            for fname in files:
                if not fname.endswith(".parquet"):
                    continue
                src = os.path.join(dirpath, fname)
                stats = _parquet_stats(src)
                if stats["numRecords"] == 0:
                    continue  # stats-less empty adds defeat pruning
                dest_dir = os.path.join(self.root, rel_dir)
                os.makedirs(dest_dir, exist_ok=True)
                shutil.move(src, os.path.join(dest_dir, fname))
                rel_path = (
                    os.path.join(rel_dir, fname) if rel_dir else fname
                )
                adds.append(
                    {
                        "path": rel_path.replace(os.sep, "/"),
                        "partitionValues": _parse_partition_values(rel_dir),
                        "size": os.path.getsize(
                            os.path.join(dest_dir, fname)
                        ),
                        "modificationTime": now_ms,
                        "dataChange": True,
                        "stats": json.dumps(stats),
                    }
                )
        shutil.rmtree(staging, ignore_errors=True)
        return adds

    def _stage_cdc(self, df) -> tuple[list[dict], list[str]]:
        """Write CDF change rows (must carry ``_change_type``) as
        ``_change_data/`` cdc parquet via staging. Returns (cdc
        actions, absolute written paths — for cleanup if the commit
        aborts)."""
        import shutil
        import uuid

        cd_dir = os.path.join(self.root, "_change_data")
        os.makedirs(cd_dir, exist_ok=True)
        staging = os.path.join(self.root, f"_staging-{uuid.uuid4().hex}")
        df.write.mode("overwrite").parquet(staging)
        actions: list[dict] = []
        written: list[str] = []
        for fname in sorted(os.listdir(staging)):
            if not fname.endswith(".parquet"):
                continue
            src = os.path.join(staging, fname)
            dest_name = f"cdc-{uuid.uuid4().hex}.parquet"
            dest = os.path.join(cd_dir, dest_name)
            shutil.move(src, dest)
            written.append(dest)
            actions.append(
                {
                    "cdc": {
                        "path": f"_change_data/{dest_name}",
                        "partitionValues": {},
                        "size": os.path.getsize(dest),
                        "dataChange": False,
                    }
                }
            )
        shutil.rmtree(staging, ignore_errors=True)
        return actions, written

    # -- row-level DELETE (deletion vectors) -----------------------------

    def delete_where(self, spark, predicate: str) -> int:
        """Row-level DELETE via DELETION VECTORS — no data file is
        rewritten: matching rows' positions become per-file roaring
        bitmaps in a ``deletion_vector_<uuid>.bin``, and each affected
        file is re-added with a ``u``-type descriptor (dataChange
        false) in one atomic commit — the same action stream
        delta-spark's DV DELETE emits, so any protocol reader applies
        it.  Matching runs against the LIVE view (existing DVs
        applied), and an affected file's new descriptor carries the
        UNION of its old DV and the new matches (the protocol
        invariant: one descriptor covers ALL deleted rows of a file).

        Driver memory: O(deleted row positions this commit) while
        building the bitmaps — the right trade until deletes are a
        large fraction of the table, at which point rewrite (overwrite)
        wins anyway."""
        import time

        from pyspark.sql import functions as F

        read_v = self.latest_version()
        state = self._py_replay(target=read_v if read_v >= 0 else None)
        if state["meta"] is None:
            raise ValueError("delete_where on an empty table")
        live = read_delta(spark, self.root, version=read_v)
        matches = (
            live.select(
                F.regexp_replace(
                    F.col("_metadata.file_path"), "^file:(//)?", ""
                ).alias("_fp"),
                F.col("_metadata.row_index").alias("_pos"),
                "*",
            )
            .filter(predicate)
            .groupBy("_fp")
            .agg(F.collect_list("_pos").alias("_positions"))
            .collect()
        )
        if not matches:
            return self.latest_version()  # no-op
        by_abs = {r["_fp"]: sorted(r["_positions"]) for r in matches}
        # map absolute matched paths back to the log's relative adds
        now_ms = int(time.time() * 1000)
        actions: list[dict] = [
            {
                "commitInfo": {
                    "operation": "DELETE",
                    "operationParameters": {"predicate": predicate},
                    "timestamp": now_ms,
                }
            }
        ]
        cdc_written: list[str] = []  # cleaned up if the commit aborts
        if self._cdf_enabled(state["meta"]):
            # CDF: the deleted rows land as _change_data/ cdc parquet
            # (one executor-parallel job over only the matching rows)
            # + cdc actions — delta-spark's DELETE-with-CDF shape, the
            # only way a DV delete's change set is servable later
            # (table_changes raises without it).
            cdc_actions, cdc_written = self._stage_cdc(
                live.filter(predicate).withColumn(
                    "_change_type", F.lit("delete")
                )
            )
            actions.extend(cdc_actions)
        try:
            n_hit, actions = self._dv_delete_actions(
                state, by_abs, actions, now_ms
            )
            if n_hit != len(by_abs):
                raise RuntimeError(
                    "matched files missing from the log snapshot "
                    f"({len(by_abs)} matched, {n_hit} resolved)"
                )
            version = self._atomic_commit(
                actions,
                read_version=read_v,
                # conflict = someone touched a file we re-add with a
                # DV; blind appends of new files rebase safely
                read_files={
                    a["remove"]["path"] for a in actions
                    if "remove" in a
                },
            )
        except BaseException:
            # an abort anywhere after cdc staging (a failed DV write,
            # the conflict check, a refused claim) must not orphan
            # the cdc parquet — nothing references these paths, and
            # vacuum's log scan would otherwise never reclaim them
            for p in cdc_written:
                try:
                    os.remove(p)
                except OSError:
                    pass
            raise
        if version > 0 and version % self.checkpoint_every == 0:
            self._write_checkpoint(version)
        return version

    def _dv_delete_actions(self, state, by_abs, actions, now_ms):
        """Per touched file: union the new positions with the file's
        existing DV, write the roaring bitmap sidecar, and append the
        (remove, re-add-with-descriptor) action pair."""
        import uuid as _uuid

        from kafka_delta_ingest_spark.roaring import (
            deserialize_rbm_array,
            dv_descriptor_bytes,
            write_dv_file,
            z85_encode,
        )

        n_hit = 0
        for rel, a in state["adds"].items():
            ap = rel
            ap = urllib.parse.unquote(ap)
            if not os.path.isabs(ap):
                ap = os.path.join(self.root, ap)
            pos = by_abs.get(ap)
            if pos is None:
                continue
            n_hit += 1
            all_pos = set(pos)
            if a.get("deletionVector"):
                all_pos |= set(
                    deserialize_rbm_array(
                        dv_descriptor_bytes(
                            self.root, a["deletionVector"]
                        )
                    )
                )
            u = _uuid.uuid4()
            metas = write_dv_file(
                os.path.join(self.root, f"deletion_vector_{u}.bin"),
                [sorted(all_pos)],
            )
            new_add = dict(a)
            new_add["deletionVector"] = {
                "storageType": "u",
                "pathOrInlineDv": z85_encode(u.bytes),
                "offset": metas[0]["offset"],
                "sizeInBytes": metas[0]["sizeInBytes"],
                "cardinality": metas[0]["cardinality"],
            }
            new_add["dataChange"] = False
            actions.append(
                {
                    "remove": {
                        "path": rel,
                        "deletionTimestamp": now_ms,
                        "dataChange": False,
                        # tombstone the (path, old dv uid) entry only
                        **(
                            {"deletionVector": a["deletionVector"]}
                            if a.get("deletionVector") else {}
                        ),
                    }
                }
            )
            actions.append({"add": new_add})
        return n_hit, actions

    # -- CHECK constraints (ALTER TABLE ADD CONSTRAINT parity) ------------

    def constraints(self, meta: dict | None = None) -> dict[str, str]:
        """name → CHECK expression, from ``delta.constraints.*``
        table configuration (the protocol's constraint channel —
        delta-spark enforces the same keys)."""
        if meta is None:
            meta = self._py_replay()["meta"]
        cfg = (meta or {}).get("configuration") or {}
        pre = "delta.constraints."
        return {
            k[len(pre):]: v for k, v in cfg.items() if k.startswith(pre)
        }

    def add_constraint(self, spark, name: str, expr: str) -> int:
        """ALTER TABLE ADD CONSTRAINT <name> CHECK (<expr>) on the
        standard log: existing rows are validated first (Delta scans
        the table before accepting a constraint), then one commit
        carries the updated metaData configuration plus the protocol
        bump to minWriterVersion 3 (the version that obliges writers
        to enforce CHECK constraints — delta-spark refuses to write
        tables it cannot enforce). NULL results satisfy the check
        (SQL standard), matching the kdi sink's semantics."""
        import time

        from pyspark.sql import functions as F

        from kafka_delta_ingest_spark.sinks.delta_like import (
            ConstraintViolation,
        )

        read_v = self.latest_version()
        state = self._py_replay(target=read_v if read_v >= 0 else None)
        meta = state["meta"]
        if meta is None:
            raise ValueError("table has no schema yet")
        if name in self.constraints(meta):
            raise ValueError(f"constraint {name!r} already exists")
        existing = read_delta(spark, self.root, version=read_v)
        n_bad = existing.filter(
            ~F.coalesce(F.expr(expr), F.lit(True))
        ).count()
        if n_bad:
            raise ConstraintViolation(
                f"cannot add constraint {name!r}: {n_bad} existing "
                f"row(s) violate CHECK ({expr})"
            )
        new_meta = dict(meta)
        cfg = dict(meta.get("configuration") or {})
        cfg[f"delta.constraints.{name}"] = expr
        new_meta["configuration"] = cfg
        return self._atomic_commit(
            [
                {
                    "commitInfo": {
                        "operation": f"ADD CONSTRAINT {name}",
                        "timestamp": int(time.time() * 1000),
                    }
                },
                {
                    "protocol": {
                        "minReaderVersion": 1,
                        "minWriterVersion": 3,
                    }
                },
                {"metaData": new_meta},
            ],
            read_version=read_v,
            conflict_on_any_change=True,
        )

    def drop_constraint(self, name: str) -> int:
        import time

        read_v = self.latest_version()
        state = self._py_replay(target=read_v if read_v >= 0 else None)
        meta = state["meta"]
        key = f"delta.constraints.{name}"
        if meta is None or key not in (meta.get("configuration") or {}):
            raise ValueError(f"no such constraint: {name!r}")
        new_meta = dict(meta)
        cfg = dict(meta["configuration"])
        del cfg[key]
        new_meta["configuration"] = cfg
        return self._atomic_commit(
            [
                {
                    "commitInfo": {
                        "operation": f"DROP CONSTRAINT {name}",
                        "timestamp": int(time.time() * 1000),
                    }
                },
                {"metaData": new_meta},
            ],
            read_version=read_v,
            conflict_on_any_change=True,
        )

    def _enforce_constraints(self, df, meta: dict) -> None:
        """Raise :class:`ConstraintViolation` when any row of ``df``
        fails a stored CHECK constraint — one combined pass (a single
        filter over the frame, short-circuited at the first hit),
        then the violated names identified on the sample row."""
        from pyspark.sql import functions as F

        from kafka_delta_ingest_spark.sinks.delta_like import (
            ConstraintViolation,
        )

        cons = self.constraints(meta)
        if not cons:
            return
        checks = {
            n: F.coalesce(F.expr(e), F.lit(True))
            for n, e in cons.items()
        }
        viol = None
        for c in checks.values():
            viol = ~c if viol is None else (viol | ~c)
        rows = (
            df.filter(viol).limit(1)
            .select(*[(~c).alias(n) for n, c in checks.items()])
            .collect()
        )
        if rows:
            violated = [n for n in checks if rows[0][n]]
            raise ConstraintViolation(
                f"CHECK constraint(s) {violated} violated by write "
                f"({ {n: cons[n] for n in violated} })"
            )

    # -- row-level UPDATE / MERGE (copy-on-write) -------------------------

    def update_where(
        self, spark, predicate: str, set_exprs: dict[str, str]
    ) -> int:
        """Row-level UPDATE via copy-on-write: only the files that
        contain a matching row are rewritten (one executor-parallel
        job over exactly those files' live rows); untouched files keep
        their add actions. ``set_exprs`` maps column → SQL expression
        (evaluated per matching row; non-matching rows in a touched
        file are carried through unchanged). With CDF on, the change
        set lands as ``update_preimage``/``update_postimage`` cdc rows
        — delta-spark's UPDATE shape (reference parity surface:
        delta-rs exposes the same op; the daemon itself is
        append-only, README.adoc:3-5).

        Scale: matching is one pruned scan (predicate pushed to
        parquet); the rewrite reads only touched files, so cost is
        O(touched data), not O(table). Commit conflicts follow
        delete_where's file-level rule: an intervening commit touching
        a rewritten file raises, blind appends rebase."""
        import time

        from pyspark.sql import functions as F

        read_v = self.latest_version()
        state = self._py_replay(target=read_v if read_v >= 0 else None)
        if state["meta"] is None:
            raise ValueError("update_where on an empty table")
        schema_cols = [
            f["name"]
            for f in json.loads(state["meta"]["schemaString"])["fields"]
        ]
        unknown = set(set_exprs) - set(schema_cols)
        if unknown:
            raise ValueError(f"SET targets not in table schema: "
                             f"{sorted(unknown)}")
        part_cols = state["meta"].get("partitionColumns") or []
        if set(set_exprs) & set(part_cols):
            raise ValueError(
                "updating partition columns is not supported "
                f"({sorted(set(set_exprs) & set(part_cols))})"
            )
        live = read_delta(spark, self.root, version=read_v)
        tagged = live.select(
            F.regexp_replace(
                F.col("_metadata.file_path"), "^file:(//)?", ""
            ).alias("__fp"),
            "*",
        )
        touched_abs = {
            r["__fp"]
            for r in tagged.filter(predicate)
            .select("__fp").distinct().collect()
        }
        if not touched_abs:
            return read_v  # no-op
        touched_rel = self._resolve_touched(state, touched_abs)
        now_ms = int(time.time() * 1000)

        rows = tagged.filter(F.col("__fp").isin(list(touched_abs)))
        cond = F.expr(predicate)
        # conform: a SET expression that changes a column's type must
        # raise (or safe-upcast), never land drifted parquet schemas
        updated = self._conform_frame(
            rows.select(
                *[
                    (
                        F.when(cond, F.expr(set_exprs[c]))
                        .otherwise(F.col(c)).alias(c)
                        if c in set_exprs else F.col(c)
                    )
                    for c in schema_cols
                ]
            ),
            state["meta"],
        )
        self._enforce_constraints(updated, state["meta"])
        actions: list[dict] = [
            {
                "commitInfo": {
                    "operation": "UPDATE",
                    "operationParameters": {"predicate": predicate},
                    "timestamp": now_ms,
                }
            }
        ]
        cdc_written: list[str] = []
        if self._cdf_enabled(state["meta"]):
            pre = rows.filter(cond).drop("__fp").withColumn(
                "_change_type", F.lit("update_preimage")
            )
            post = self._conform_frame(
                rows.filter(cond).select(
                    *[
                        (
                            F.expr(set_exprs[c]).alias(c)
                            if c in set_exprs else F.col(c)
                        )
                        for c in schema_cols
                    ]
                ),
                state["meta"],
            ).withColumn("_change_type", F.lit("update_postimage"))
            cdc_actions, cdc_written = self._stage_cdc(
                pre.unionByName(post)
            )
            actions.extend(cdc_actions)
        # everything from data staging through the commit claim is
        # all-or-nothing: a failed staging job or a refused claim must
        # not orphan the already-written cdc parquet or promoted adds
        adds: list[dict] = []
        try:
            adds = self._stage_adds(updated, part_cols, now_ms)
            for rel in sorted(touched_rel):
                a = state["adds"][rel]
                actions.append(
                    {
                        "remove": {
                            "path": rel,
                            "deletionTimestamp": now_ms,
                            "dataChange": True,
                            **(
                                {"deletionVector": a["deletionVector"]}
                                if a.get("deletionVector") else {}
                            ),
                        }
                    }
                )
            actions += [{"add": a} for a in adds]
            version = self._atomic_commit(
                actions,
                read_version=read_v,
                read_files=touched_rel,
            )
        except BaseException:
            for p in cdc_written:
                try:
                    os.remove(p)
                except OSError:
                    pass
            for a in adds:
                try:
                    os.remove(os.path.join(self.root, a["path"]))
                except OSError:
                    pass
            raise
        if version > 0 and version % self.checkpoint_every == 0:
            self._write_checkpoint(version)
        return version

    def _resolve_touched(
        self, state: dict, touched_abs: set[str]
    ) -> set[str]:
        """Map absolute matched file paths back to the snapshot's
        relative add paths; raises if any matched file is not in the
        snapshot (the read view and the snapshot must agree)."""
        touched_rel: set[str] = set()
        remaining = set(touched_abs)
        for rel in state["adds"]:
            ap = urllib.parse.unquote(rel)
            if not os.path.isabs(ap):
                ap = os.path.join(self.root, ap)
            if ap in remaining:
                touched_rel.add(rel)
                remaining.discard(ap)
        if remaining:
            raise RuntimeError(
                f"matched files missing from the log snapshot: "
                f"{sorted(remaining)[:3]}"
            )
        return touched_rel

    def merge(
        self,
        spark,
        source,
        on: str,
        *,
        when_matched_update: dict[str, str] | None = None,
        when_matched_delete: str | bool | None = None,
        when_not_matched_insert: dict[str, str] | bool = True,
        txn: dict[str, int] | None = None,
    ) -> int:
        """MERGE INTO (upsert) with delta-spark's clause semantics on
        the standard log. ``source`` is any DataFrame; ``on`` is a SQL
        join condition over the ``source`` and ``target`` aliases
        (e.g. ``"source.id = target.id"``). Clauses:

        * ``when_matched_update`` — column → SQL expression over
          ``source.``/``target.`` (applied to matched target rows);
        * ``when_matched_delete`` — ``True`` (delete every matched
          row) or a SQL condition string;
        * ``when_not_matched_insert`` — ``True`` (insert source rows
          by name; missing target columns null) or column → expression
          over ``source.``.

        Delete is evaluated before update when both are given a
        condition (delta-spark applies clauses in order; pass only
        what you need). A source that matches the same target row
        more than once raises (the protocol's cardinality violation).

        Copy-on-write: only target files containing a matched row are
        rewritten; inserts append new files; untouched files keep
        their adds. With CDF on, emits ``update_preimage``/
        ``update_postimage``/``delete``/``insert`` cdc rows.

        Scale: match discovery is one join (AQE broadcasts a small
        source); the rewrite re-joins ONLY touched files' rows against
        the source, so cost is O(touched + source), not O(table).
        Because MERGE's read set is the whole target (the not-matched
        anti-join), the commit conflicts on ANY intervening data
        change — delta-spark's Serializable default for MERGE.

        ``txn`` (appId → version) makes the merge EXACTLY-ONCE like
        :meth:`write`: if every supplied appId is already at-or-beyond
        its version in the log the merge is SKIPPED (replay after a
        crash/restart), the committed version carries the txn actions,
        and a racer landing the same batch first is re-detected at
        claim time — the reference's offset-ledger mechanism applied
        to CDC-apply streams."""
        import time

        from pyspark.sql import functions as F

        if not (when_matched_update or when_matched_delete
                or when_not_matched_insert):
            raise ValueError("merge with no clauses")
        txn = dict(txn or {})
        read_v = self.latest_version()
        state = self._py_replay(target=read_v if read_v >= 0 else None)
        if state["meta"] is None:
            raise ValueError("merge into an empty table")
        if txn:
            stored = state["txn"]
            if all(
                app in stored and stored[app] >= ver
                for app, ver in txn.items()
            ):
                return read_v  # replay — this merge already applied
        schema_cols = [
            f["name"]
            for f in json.loads(state["meta"]["schemaString"])["fields"]
        ]
        part_cols = state["meta"].get("partitionColumns") or []
        live = read_delta(spark, self.root, version=read_v)
        tagged = live.select(
            F.regexp_replace(
                F.col("_metadata.file_path"), "^file:(//)?", ""
            ).alias("__fp"),
            F.col("_metadata.row_index").alias("__pos"),
            "*",
        ).alias("target")
        src = source.alias("source")
        on_expr = F.expr(on)

        matched = tagged.join(src, on_expr, "inner")
        # cardinality check + touched-file discovery in ONE pass over
        # the match join (driver gets only file paths + a violation bit)
        card = (
            matched.groupBy("target.__fp", "target.__pos")
            .agg(F.count(F.lit(1)).alias("__n"))
            .groupBy("__fp")
            .agg(F.max("__n").alias("__maxn"))
            .collect()
        )
        if any(r["__maxn"] > 1 for r in card):
            raise ValueError(
                "merge cardinality violation: a target row matched "
                "more than one source row"
            )
        touched_abs = {r["__fp"] for r in card}
        touched_rel = self._resolve_touched(state, touched_abs)
        now_ms = int(time.time() * 1000)

        del_cond = None
        if when_matched_delete is True:
            del_cond = F.lit(True)
        elif isinstance(when_matched_delete, str):
            del_cond = F.expr(when_matched_delete)

        # rewrite phase: touched files' rows LEFT JOIN source
        pieces = []
        cdc_pieces = []
        if touched_abs:
            rows = tagged.filter(
                F.col("__fp").isin(list(touched_abs))
            ).alias("target")
            # re-alias after withColumn — projections drop the
            # subquery alias the ON condition resolves against
            src_m = source.withColumn(
                "__match", F.lit(True)
            ).alias("source")
            joined = rows.join(src_m, on_expr, "left")
            is_match = F.col("__match").isNotNull()
            is_del = (
                (is_match & del_cond) if del_cond is not None
                else F.lit(False)
            )
            upd = when_matched_update or {}
            is_upd = is_match & ~is_del if upd else F.lit(False)
            new_vals = [
                (
                    F.when(is_upd, F.expr(upd[c]))
                    .otherwise(F.col(f"target.{c}")).alias(c)
                    if c in upd else F.col(f"target.{c}").alias(c)
                )
                for c in schema_cols
            ]
            kept = self._conform_frame(
                joined.filter(~is_del).select(*new_vals),
                state["meta"],
            )
            pieces.append(kept)
            if self._cdf_enabled(state["meta"]):
                tgt_vals = [
                    F.col(f"target.{c}").alias(c) for c in schema_cols
                ]
                cdc_pieces.append(
                    joined.filter(is_del).select(*tgt_vals)
                    .withColumn("_change_type", F.lit("delete"))
                )
                if upd:
                    cdc_pieces.append(
                        joined.filter(is_upd).select(*tgt_vals)
                        .withColumn(
                            "_change_type", F.lit("update_preimage")
                        )
                    )
                    cdc_pieces.append(
                        self._conform_frame(
                            joined.filter(is_upd).select(*new_vals),
                            state["meta"],
                        ).withColumn(
                            "_change_type", F.lit("update_postimage")
                        )
                    )

        # insert phase: source rows with no target match
        inserts = None
        if when_not_matched_insert:
            unmatched = src.join(tagged, on_expr, "left_anti")
            if when_not_matched_insert is True:
                src_cols = set(unmatched.columns)
                inserts = unmatched.select(
                    *[
                        (
                            F.col(c) if c in src_cols
                            else F.lit(None).alias(c)
                        )
                        for c in schema_cols
                    ]
                )
            else:
                ins = when_not_matched_insert
                inserts = unmatched.select(
                    *[
                        (
                            F.expr(ins[c]).alias(c) if c in ins
                            else F.lit(None).alias(c)
                        )
                        for c in schema_cols
                    ]
                )
            inserts = self._conform_frame(inserts, state["meta"])
            pieces.append(inserts)
            if self._cdf_enabled(state["meta"]):
                cdc_pieces.append(
                    inserts.withColumn("_change_type", F.lit("insert"))
                )

        if not pieces:
            return read_v
        out = pieces[0]
        for p in pieces[1:]:
            out = out.unionByName(p)
        self._enforce_constraints(out, state["meta"])

        actions: list[dict] = [
            {
                "commitInfo": {
                    "operation": "MERGE",
                    "operationParameters": {"predicate": on},
                    "timestamp": now_ms,
                }
            }
        ]
        cdc_written: list[str] = []
        if cdc_pieces:
            cdc = cdc_pieces[0]
            for p in cdc_pieces[1:]:
                cdc = cdc.unionByName(p)
            cdc_actions, cdc_written = self._stage_cdc(cdc)
            actions.extend(cdc_actions)
        # staging-through-claim is all-or-nothing (see update_where)
        adds: list[dict] = []
        try:
            adds = self._stage_adds(out, part_cols, now_ms)
            for rel in sorted(touched_rel):
                a = state["adds"][rel]
                actions.append(
                    {
                        "remove": {
                            "path": rel,
                            "deletionTimestamp": now_ms,
                            "dataChange": True,
                            **(
                                {"deletionVector": a["deletionVector"]}
                                if a.get("deletionVector") else {}
                            ),
                        }
                    }
                )
            actions += [
                {"txn": {"appId": a, "version": v,
                         "lastUpdated": now_ms}}
                for a, v in sorted(txn.items())
            ]
            actions += [{"add": a} for a in adds]
            version = self._atomic_commit(
                actions,
                read_version=read_v,
                conflict_on_any_change=True,
                txn=txn or None,
            )
        except BaseException:
            for p in cdc_written:
                try:
                    os.remove(p)
                except OSError:
                    pass
            for a in adds:
                try:
                    os.remove(os.path.join(self.root, a["path"]))
                except OSError:
                    pass
            raise
        if version > 0 and version % self.checkpoint_every == 0:
            self._write_checkpoint(version)
        return version

    # -- RESTORE / VACUUM -------------------------------------------------

    def restore(self, version: int) -> int:
        """RESTORE TO VERSION AS OF ``version``: commits the forward
        diff — remove every file live now but not then, re-add every
        file live then but not now (a path whose DV descriptor differs
        is re-added with the target's descriptor). History is
        preserved: this lands as a NEW version; the rolled-back
        commits stay time-travelable. Pure log metadata, O(diff) not
        O(table) — restoring a 100 TB table after a bad batch is
        instant. Raises if a file the restore resurrects was already
        vacuumed."""
        import time

        cur_v = self.latest_version()
        if version < 0 or version > cur_v:
            raise ValueError(f"version {version} does not exist")
        if version == cur_v:
            return cur_v
        cur = self._py_replay(target=cur_v)
        tgt = self._py_replay(target=version)

        def dv_key(a):
            d = a.get("deletionVector") or {}
            return (d.get("pathOrInlineDv"), d.get("offset"))

        now_ms = int(time.time() * 1000)
        actions: list[dict] = [
            {
                "commitInfo": {
                    "operation": "RESTORE",
                    "operationParameters": {"version": str(version)},
                    "timestamp": now_ms,
                }
            }
        ]
        if tgt["meta"] != cur["meta"] and tgt["meta"] is not None:
            actions.append({"metaData": tgt["meta"]})
        for rel, a in cur["adds"].items():
            t = tgt["adds"].get(rel)
            if t is None or dv_key(t) != dv_key(a):
                actions.append(
                    {
                        "remove": {
                            "path": rel,
                            "deletionTimestamp": now_ms,
                            "dataChange": True,
                            # key the tombstone to the CURRENT add's dv
                            **(
                                {"deletionVector": a["deletionVector"]}
                                if a.get("deletionVector") else {}
                            ),
                        }
                    }
                )
        for rel, t in tgt["adds"].items():
            c = cur["adds"].get(rel)
            if c is None or dv_key(c) != dv_key(t):
                ap = urllib.parse.unquote(rel)
                if not os.path.isabs(ap):
                    ap = os.path.join(self.root, ap)
                if not os.path.exists(ap):
                    raise ValueError(
                        f"cannot restore to {version}: {rel} was "
                        "already vacuumed"
                    )
                actions.append({"add": {**t, "dataChange": True}})
        version_out = self._atomic_commit(
            actions,
            # restore's read set is the WHOLE table diff — any
            # concurrent data change invalidates it
            read_version=cur_v,
            conflict_on_any_change=True,
        )
        if version_out > 0 and version_out % self.checkpoint_every == 0:
            self._write_checkpoint(version_out)
        return version_out

    def vacuum(self, retention_ms: int = 7 * 24 * 3600 * 1000,
               now_ms: int | None = None) -> list[str]:
        """Physically delete tombstoned data files (and DV ``.bin``
        files no live add references) whose remove timestamp is older
        than ``retention_ms``. Returns deleted relative paths. No
        commit — vacuum reclaims storage, it does not change state;
        time travel past the retention window stops working, exactly
        Delta's contract."""
        import time

        import uuid as _uuid

        from kafka_delta_ingest_spark.roaring import z85_decode

        if now_ms is None:
            now_ms = int(time.time() * 1000)
        cutoff = now_ms - retention_ms
        state = self._py_replay()
        live = set(state["adds"])

        def dv_bin_of(a) -> str | None:
            d = a.get("deletionVector")
            if d and d.get("storageType") == "u":
                u = _uuid.UUID(
                    bytes=z85_decode(d["pathOrInlineDv"][-20:])
                )
                return f"deletion_vector_{u}.bin"
            return None

        # candidate tombstones from the JSON log (removed paths that
        # never came back); DV bins stay referenced by ANY add action
        # in the retained log — a superseded descriptor is still
        # needed to time-travel to the version that wrote it, so only
        # truly unreferenced bins (crashed writes) are reclaimed.
        victims: dict[str, int] = {}
        referenced_dvs: set[str] = set()
        cdc_refs: dict[str, int] = {}  # cdc rel path -> commit ts
        for v in _commit_versions(self.log, self.store):
            commit_ts = 0
            commit_cdc: list[str] = []
            body = self.store.read_bytes(
                os.path.join(self.log, f"{v:020d}.json")
            ).decode()
            for line in body.splitlines():
                    act = json.loads(line)
                    if "remove" in act:
                        r = act["remove"]
                        victims[r["path"]] = r.get(
                            "deletionTimestamp", 0
                        )
                    elif "add" in act:
                        victims.pop(act["add"]["path"], None)
                        b = dv_bin_of(act["add"])
                        if b:
                            referenced_dvs.add(b)
                    elif "cdc" in act:
                        commit_cdc.append(act["cdc"]["path"])
                    elif "commitInfo" in act:
                        commit_ts = act["commitInfo"].get(
                            "timestamp", 0
                        )
            for p in commit_cdc:
                cdc_refs[p] = commit_ts
        cp = _best_checkpoint(self.log, self.latest_version())
        if cp is not None:
            for a in state["adds"].values():
                b = dv_bin_of(a)
                if b:
                    referenced_dvs.add(b)
        deleted = []
        for rel, ts in victims.items():
            if rel in live or ts > cutoff:
                continue
            ap = urllib.parse.unquote(rel)
            if not os.path.isabs(ap):
                ap = os.path.join(self.root, ap)
            if os.path.exists(ap):
                os.remove(ap)
                deleted.append(rel)
        for fname in os.listdir(self.root):
            if (
                fname.startswith("deletion_vector_")
                and fname.endswith(".bin")
                and fname not in referenced_dvs
            ):
                ap = os.path.join(self.root, fname)
                # age-gate unreferenced bins like data tombstones: an
                # in-flight delete_where writes the .bin BEFORE its
                # commit — deleting a young bin races that commit and
                # leaves its descriptor dangling (r8 ADVICE, medium)
                if int(os.path.getmtime(ap) * 1000) > cutoff:
                    continue
                os.remove(ap)
                deleted.append(fname)
        # _change_data: cdc parquet is only servable through
        # table_changes while its commit sits inside the retention
        # window — delta-spark's vacuum ages CDF out on the same
        # clock as data tombstones. Unreferenced files (a crashed or
        # aborted delete_where) reclaim on the same age gate, keyed
        # on mtime since no commit ever named them.
        cd_dir = os.path.join(self.root, "_change_data")
        if os.path.isdir(cd_dir):
            for fname in sorted(os.listdir(cd_dir)):
                rel = f"_change_data/{fname}"
                ap = os.path.join(cd_dir, fname)
                ref_ts = cdc_refs.get(rel)
                age_ts = (
                    ref_ts
                    if ref_ts is not None
                    else int(os.path.getmtime(ap) * 1000)
                )
                if age_ts > cutoff:
                    continue
                os.remove(ap)
                deleted.append(rel)
        return deleted

    # -- OPTIMIZE (bin-packing compaction) -------------------------------

    def optimize(self, spark, target_file_bytes: int = 134_217_728,
                 zorder_by: list[str] | None = None) -> int:
        """Bin-pack small files and MATERIALIZE deletion vectors: per
        partition, every live file under ``target_file_bytes`` (plus
        every DV-carrying file, whose tombstoned rows get physically
        dropped here) is rewritten into coalesced files; the commit
        removes the inputs and adds the outputs with
        ``dataChange=false`` — the standard OPTIMIZE action stream, so
        any reader sees identical rows before and after. Returns the
        committed version (or the current one when nothing qualifies).

        ``zorder_by`` (delta-spark's OPTIMIZE ... ZORDER BY on the
        standard log): EVERY live file rewrites; rows range-partition
        on the Morton interleave of the columns' normalized ranks
        (sinks.delta_like.zorder_value) into ~target-sized files, each
        sorted within — every output file then carries a narrow
        min/max window on EVERY clustered column in its add-action
        stats, so any protocol reader's data skipping prunes on all of
        them at once.

        Scale: each partition group is one Spark job over only the
        files being rewritten; the commit is metadata."""
        import shutil
        import time
        import uuid

        from pyspark.sql import functions as F

        from kafka_delta_ingest_spark.sinks.delta_like import (
            _parquet_stats,
            zorder_value,
        )

        read_v = self.latest_version()
        state = self._py_replay(target=read_v if read_v >= 0 else None)
        if state["meta"] is None:
            return self.latest_version()
        groups: dict[tuple, list[tuple[str, dict]]] = {}
        for rel, a in state["adds"].items():
            if (
                not zorder_by  # ZORDER re-clusters EVERY live file
                and a.get("size", 0) >= target_file_bytes
                and not a.get("deletionVector")
            ):
                continue
            pv = tuple(sorted((a.get("partitionValues") or {}).items()))
            groups.setdefault(pv, []).append((rel, a))
        if not zorder_by:
            # a group of one small DV-free file gains nothing from
            # rewrite (a zorder pass rewrites it anyway: the point is
            # the ORDER, not the size)
            groups = {
                pv: files
                for pv, files in groups.items()
                if len(files) > 1
                or any(a.get("deletionVector") for _, a in files)
            }
        if not groups:
            return self.latest_version()
        now_ms = int(time.time() * 1000)
        actions: list[dict] = [
            {
                "commitInfo": {
                    "operation": "OPTIMIZE",
                    "operationParameters": {
                        "targetSize": str(target_file_bytes),
                        **(
                            {"zOrderBy": json.dumps(zorder_by)}
                            if zorder_by else {}
                        ),
                    },
                    "timestamp": now_ms,
                }
            }
        ]
        # Compaction inputs MUST read under the table's current
        # metaData.schemaString, not a sampled footer: after
        # evolve_schema() a group can mix old- and new-schema files,
        # and a bare spark.read.parquet would silently drop the
        # evolved column from the rewritten file while tombstoning
        # the originals (permanent data loss). Explicit schema
        # null-fills files that predate the column — exactly the
        # protocol's read semantics. Partition columns never live in
        # the data files, so they are excluded from the read schema.
        from pyspark.sql.types import StructType

        part_cols = set(state["meta"].get("partitionColumns") or [])
        table_fields = json.loads(
            state["meta"]["schemaString"]
        )["fields"]
        read_schema = StructType.fromJson(
            {
                "type": "struct",
                "fields": [
                    f for f in table_fields if f["name"] not in part_cols
                ],
            }
        )
        for pv, files in sorted(groups.items()):
            rels = [rel for rel, _ in files]
            dv_in = [a for _, a in files if a.get("deletionVector")]
            paths = [
                os.path.join(self.root, urllib.parse.unquote(r))
                for r in rels
            ]
            df = spark.read.schema(read_schema).parquet(*paths)
            if dv_in:
                df = df.select(
                    "*",
                    F.regexp_replace(
                        F.col("_metadata.file_path"), "^file:(//)?", ""
                    ).alias("_kdi_fp"),
                    F.col("_metadata.row_index").alias("_kdi_pos"),
                )
                df = _apply_deletion_vectors(
                    spark, self.root, df, dv_in,
                    lambda p: os.path.join(
                        self.root, urllib.parse.unquote(p)
                    ),
                )
            staging = os.path.join(
                self.root, f"_staging-{uuid.uuid4().hex}"
            )
            if zorder_by:
                # range-split on the Morton key into ~target-sized
                # files, each sorted within: every output file gets a
                # narrow stats window on EVERY clustered column
                total = sum(a.get("size", 0) for _, a in files)
                n_out = max(1, -(-total // target_file_bytes))
                df = (
                    df.withColumn("_kdi_zv", zorder_value(df, zorder_by))
                    .repartitionByRange(n_out, "_kdi_zv")
                    .sortWithinPartitions("_kdi_zv")
                    .drop("_kdi_zv")
                )
                df.write.mode("overwrite").parquet(staging)
            else:
                df.coalesce(1).write.mode("overwrite").parquet(staging)
            rel_dir = os.path.dirname(rels[0])
            for fname in sorted(os.listdir(staging)):
                if not fname.endswith(".parquet"):
                    continue
                src = os.path.join(staging, fname)
                stats = _parquet_stats(src)
                if stats["numRecords"] == 0:
                    continue
                dest_dir = os.path.join(self.root, rel_dir)
                os.makedirs(dest_dir, exist_ok=True)
                new_name = f"part-opt-{uuid.uuid4().hex}.parquet"
                shutil.move(src, os.path.join(dest_dir, new_name))
                new_rel = (
                    os.path.join(rel_dir, new_name).replace(os.sep, "/")
                    if rel_dir
                    else new_name
                )
                actions.append(
                    {
                        "add": {
                            "path": new_rel,
                            "partitionValues": dict(pv),
                            "size": os.path.getsize(
                                os.path.join(dest_dir, new_name)
                            ),
                            "modificationTime": now_ms,
                            "dataChange": False,
                            "stats": json.dumps(stats),
                        }
                    }
                )
            shutil.rmtree(staging, ignore_errors=True)
            actions += [
                {
                    "remove": {
                        "path": rel,
                        "deletionTimestamp": now_ms,
                        "dataChange": False,
                        # compacted inputs may carry DVs — key the
                        # tombstone to the input add's descriptor
                        **(
                            {"deletionVector": a["deletionVector"]}
                            if a.get("deletionVector") else {}
                        ),
                    }
                }
                for rel, a in files
            ]
        version = self._atomic_commit(
            actions,
            read_version=read_v,
            # conflict = someone touched a compaction input; appends
            # of new files rebase safely (they were not compacted)
            read_files={
                a["remove"]["path"] for a in actions if "remove" in a
            },
        )
        if version > 0 and version % self.checkpoint_every == 0:
            self._write_checkpoint(version)
        return version

    # -- checkpoint ------------------------------------------------------

    def _write_checkpoint(self, version: int) -> None:
        """Single-part parquet checkpoint of the reconciled state at
        ``version`` + ``_last_checkpoint`` pointer (protocol layout:
        one action per row, struct columns, stats as JSON string).
        Replay is PINNED to ``version`` — a concurrent writer's later
        commit must never leak into a checkpoint named for an earlier
        version (time travel / RESTORE would silently read the future)."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        state = self._py_replay(target=version)
        rows = [
            {
                "protocol": state["protocol"]
                or {"minReaderVersion": 1, "minWriterVersion": 2},
                "metaData": state["meta"],
                "add": None,
                "remove": None,
                "txn": None,
            }
        ]
        rows += [
            {
                "protocol": None,
                "metaData": None,
                "add": None,
                "remove": None,
                # the app-transaction ledger MUST survive checkpointing
                # or exactly-once replay breaks after 10 commits
                "txn": {"appId": a, "version": v},
            }
            for a, v in sorted(state["txn"].items())
        ]
        rows += [
            {
                "protocol": None,
                "metaData": None,
                "add": {
                    "path": a["path"],
                    "partitionValues": a.get("partitionValues") or {},
                    "size": a.get("size", 0),
                    "modificationTime": a.get("modificationTime", 0),
                    "dataChange": bool(a.get("dataChange", True)),
                    "stats": a.get("stats"),
                    # DV descriptors MUST survive checkpointing or
                    # deleted rows resurrect after log truncation
                    "deletionVector": a.get("deletionVector"),
                },
                "remove": None,
                "txn": None,
            }
            for a in state["adds"].values()
        ]
        map_ss = pa.map_(pa.string(), pa.string())
        cp_schema = pa.schema(
            [
                ("protocol", pa.struct(
                    [("minReaderVersion", pa.int32()),
                     ("minWriterVersion", pa.int32())]
                )),
                ("metaData", pa.struct(
                    [("id", pa.string()),
                     ("format", pa.struct(
                         [("provider", pa.string()),
                          ("options", map_ss)]
                     )),
                     ("schemaString", pa.string()),
                     ("partitionColumns", pa.list_(pa.string())),
                     ("configuration", map_ss),
                     ("createdTime", pa.int64())]
                )),
                ("add", pa.struct(
                    [("path", pa.string()),
                     ("partitionValues", map_ss),
                     ("size", pa.int64()),
                     ("modificationTime", pa.int64()),
                     ("dataChange", pa.bool_()),
                     ("stats", pa.string()),
                     ("deletionVector", pa.struct(
                         [("storageType", pa.string()),
                          ("pathOrInlineDv", pa.string()),
                          ("offset", pa.int32()),
                          ("sizeInBytes", pa.int32()),
                          ("cardinality", pa.int64())]
                     ))]
                )),
                ("remove", pa.struct(
                    [("path", pa.string()),
                     ("deletionTimestamp", pa.int64()),
                     ("dataChange", pa.bool_())]
                )),
                ("txn", pa.struct(
                    [("appId", pa.string()),
                     ("version", pa.int64())]
                )),
            ]
        )
        import io as _io

        table = pa.Table.from_pylist(rows, schema=cp_schema)
        path = os.path.join(
            self.log, f"{version:020d}.checkpoint.parquet"
        )
        buf = _io.BytesIO()
        pq.write_table(table, buf)
        self.store.put_atomic(path, buf.getvalue())
        ptr = os.path.join(self.log, "_last_checkpoint")
        self.store.put_atomic(
            ptr,
            json.dumps(
                {"version": version, "size": len(rows)}
            ).encode(),
        )


class DeltaStandardSink:
    """``DeltaLikeTable``-surface adapter over
    :class:`DeltaStandardWriter`, so ``IngestJob`` (ingest.py) can
    stream INTO a standard ``_delta_log`` table
    (``IngestOptions.log_format == "delta"``) — the reference daemon's
    whole value proposition (Kafka → a Delta table any reader
    consumes, README.adoc:3-5) reproduced end-to-end.

    Surface implemented (exactly what the ingest loop touches):
    ``snapshot()["txn"/"version"/"metaData"]`` (ledger floors, replay
    detection, offset bootstrap), ``table_schema()`` (runtime schema
    adoption), ``write_batch(df, partition_by, txn)`` (append +
    exactly-once txn actions, empty-batch suppression), ``_commit``
    (raw txn-action commits for --seek_offsets bootstrap), ``read``,
    and ``optimize`` (the writer's bin-packing compaction, so
    ``--auto_optimize_interval`` works identically on both layouts).
    """

    def __init__(self, path: str):
        self.path = path
        self.w = DeltaStandardWriter(path)

    def snapshot(self) -> dict:
        st = self.w._py_replay()
        return {
            "txn": st["txn"],
            "version": self.w.latest_version(),
            "metaData": st["meta"],
        }

    def table_schema(self):
        st = self.w._py_replay()
        if st["meta"] is None:
            return None
        from pyspark.sql.types import StructType

        return StructType.fromJson(
            json.loads(st["meta"]["schemaString"])
        )

    def write_batch(self, df, partition_by=None, txn=None,
                    operation: str = "STREAMING UPDATE"):
        from kafka_delta_ingest_spark.sinks.delta_like import CommitResult

        before = self.w.latest_version()
        version = self.w.write(
            df, mode="append", partition_by=partition_by or None,
            txn=txn or {},
        )
        if version == before:
            # replay-skip (txn already stored) or empty batch
            return CommitResult(version, 0, 0, skipped=True)
        n_files = n_records = 0
        body = self.w.store.read_bytes(
            os.path.join(self.w.log, f"{version:020d}.json")
        ).decode()
        for line in body.splitlines():
                act = json.loads(line)
                if "add" in act:
                    n_files += 1
                    stats = act["add"].get("stats")
                    if isinstance(stats, str):
                        stats = json.loads(stats)
                    n_records += (stats or {}).get("numRecords", 0)
        return CommitResult(version, n_files, n_records)

    def _commit(self, actions: list[dict]) -> int:
        return self.w._atomic_commit(actions)

    def read(self, spark, as_of=None):
        return read_delta(spark, self.path, version=as_of)

    def optimize(self, spark, target_file_bytes: int = 134_217_728,
                 **_kwargs):
        return self.w.optimize(spark, target_file_bytes)


def table_changes(spark, table_path: str, start_version: int,
                  end_version: int | None = None):
    """Change Data Feed over a STANDARD ``_delta_log`` table: one row
    per change in ``[start_version, end_version]`` with
    ``_change_type`` / ``_commit_version`` / ``_commit_timestamp``
    meta columns — the surface ``table_changes()`` exposes in
    delta-spark (and the kdi sink already provides on its own log).

    Per commit: explicit ``cdc`` actions win (their parquet files
    carry ``_change_type``, including ``update_preimage``/
    ``update_postimage``); otherwise changes DERIVE from the data
    actions — adds with ``dataChange`` are inserts, removes with
    ``dataChange`` are deletes of the removed file's rows (readable
    until VACUUM, exactly delta-spark's derivation). Commits whose
    actions all carry ``dataChange=false`` (OPTIMIZE, clustering,
    DV re-adds) contribute nothing. A DV DELETE without a cdc action
    raises: its change set is the DV diff, which only the writer
    knows — enable CDF on the writer instead.

    Scale: one parquet scan per contributing commit, unioned — the
    cost is the changed data, never a table scan."""
    from pyspark.sql import functions as F

    log = _log_path(table_path)
    last = _resolve_version(log)
    if end_version is None:
        end_version = last
    state = _replay(spark, table_path, min(end_version, last))
    logical, rename, part_cols, _id_mode, _rf = _schema_mapping(
        state["meta"]
    )
    if part_cols and rename:
        raise ValueError(
            "table_changes on column-mapped partitioned tables is "
            "not supported here"
        )

    def _abs(p: str) -> str:
        p = urllib.parse.unquote(p)
        if p.startswith("file:"):
            p = p[len("file:"):]
        return p if os.path.isabs(p) else os.path.join(table_path, p)

    data_fields = [f for f in logical.fields if f.name not in part_cols]
    from pyspark.sql.types import StructType

    read_schema = StructType(data_fields)
    out = None
    for v in _commit_versions(log):
        if v < start_version or v > end_version:
            continue
        cdc_paths, add_paths, rm_paths = [], [], []
        ts = None
        dv_delete = False
        with open(os.path.join(log, f"{v:020d}.json")) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                act = json.loads(line)
                if "commitInfo" in act:
                    ts = act["commitInfo"].get("timestamp")
                elif "cdc" in act:
                    cdc_paths.append(act["cdc"]["path"])
                elif "add" in act:
                    if act["add"].get("dataChange", True):
                        add_paths.append(act["add"]["path"])
                    elif act["add"].get("deletionVector"):
                        dv_delete = True
                elif "remove" in act:
                    if act["remove"].get("dataChange", True):
                        rm_paths.append(act["remove"]["path"])
        frames = []
        if cdc_paths:
            cdc_schema = StructType(
                list(read_schema.fields)
                + [f for f in logical.fields if f.name in part_cols]
            ).add("_change_type", "string")
            cdf = spark.read.schema(cdc_schema)
            if part_cols:
                cdf = cdf.option("basePath", table_path)
            frames.append(cdf.parquet(*[_abs(p) for p in cdc_paths]))
        else:
            if dv_delete:
                raise ValueError(
                    f"commit {v} deletes rows via deletion vectors "
                    "without cdc actions — the change set is not "
                    "derivable; enable CDF on the writer"
                )

            def _scan(paths):
                full = StructType(
                    list(read_schema.fields)
                    + [f for f in logical.fields if f.name in part_cols]
                )
                r = spark.read.schema(full)
                if part_cols:
                    r = r.option("basePath", table_path)
                return r.parquet(*[_abs(p) for p in paths])

            if add_paths:
                frames.append(
                    _scan(add_paths).withColumn(
                        "_change_type", F.lit("insert")
                    )
                )
            if rm_paths:
                frames.append(
                    _scan(rm_paths).withColumn(
                        "_change_type", F.lit("delete")
                    )
                )
        for fr in frames:
            fr = fr.withColumn(
                "_commit_version", F.lit(v).cast("long")
            ).withColumn(
                "_commit_timestamp",
                F.lit(ts).cast("long"),
            )
            out = fr if out is None else out.unionByName(
                fr, allowMissingColumns=True
            )
    if out is None:
        raise ValueError(
            f"no changes in versions [{start_version}, {end_version}]"
        )
    return out


def delta_history(table_path: str) -> list[dict]:
    """(version, operation, timestamp) per commit — DESCRIBE HISTORY
    for standard-layout tables."""
    log = _log_path(table_path)
    out = []
    for v in _commit_versions(log):
        op, ts = None, None
        with open(os.path.join(log, f"{v:020d}.json")) as f:
            for line in f:
                act = json.loads(line)
                if "commitInfo" in act:
                    op = act["commitInfo"].get("operation")
                    ts = act["commitInfo"].get("timestamp")
                    break
        out.append({"version": v, "operation": op, "timestamp": ts})
    return out
