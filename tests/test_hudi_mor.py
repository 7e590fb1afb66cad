"""Hudi MERGE_ON_READ: HoodieLogFormat block codec roundtrips, log
merge semantics (latest-wins upserts, delete tombstones, compaction
resetting the log chain), time travel across delta commits, and
framing-corruption detection."""

import os

import pytest

from kafka_delta_ingest_spark.hudi import (
    BLOCK_AVRO_DATA,
    BLOCK_DELETE,
    HDR_INSTANT_TIME,
    HDR_SCHEMA,
    HudiMorFixtureWriter,
    decode_avro_data_block_content,
    decode_delete_block_content,
    encode_avro_data_block_content,
    encode_delete_block_content,
    encode_log_block,
    parse_log_file,
    plan_file_groups,
    plan_snapshot,
    read_hudi,
    table_properties,
)

_SCHEMA = {"id": "long", "lang": "string", "text": "string"}


@pytest.fixture()
def mor(tmp_path):
    w = HudiMorFixtureWriter(
        str(tmp_path / "m"), record_key="id", schema=_SCHEMA,
        partition_field="lang",
    )
    rows = [
        {"id": i, "lang": ["en", "fr"][i % 2], "text": f"doc {i}"}
        for i in range(12)
    ]
    i1 = w.insert(rows, ts_ms=1000, groups_per_partition=2)
    i2 = w.upsert_log(
        [{"id": 4, "lang": "en", "text": "UPDATED"},
         {"id": 5, "lang": "fr", "text": "UPDATED5"}],
        ts_ms=2000,
    )
    i3 = w.delete_log([7, 8], ts_ms=3000)
    # a second upsert to the SAME key: latest block must win
    i4 = w.upsert_log(
        [{"id": 4, "lang": "en", "text": "UPDATED-AGAIN"}], ts_ms=4000
    )
    return str(tmp_path / "m"), w, (i1, i2, i3, i4)


def test_log_block_codec_roundtrip():
    schema = {
        "type": "record", "name": "R",
        "fields": [
            {"name": "_hoodie_record_key", "type": "string"},
            {"name": "v", "type": ["null", "long"], "default": None},
        ],
    }
    recs = [{"_hoodie_record_key": "k1", "v": 7},
            {"_hoodie_record_key": "k2", "v": None}]
    import json as _json

    blob = encode_log_block(
        BLOCK_AVRO_DATA,
        {HDR_INSTANT_TIME: "20240101000000000",
         HDR_SCHEMA: _json.dumps(schema)},
        encode_avro_data_block_content(recs, schema),
    ) + encode_log_block(
        BLOCK_DELETE,
        {HDR_INSTANT_TIME: "20240101000000001"},
        encode_delete_block_content([("k1", "lang=en")]),
    )
    blocks = parse_log_file(blob)
    assert [b["type"] for b in blocks] == [BLOCK_AVRO_DATA, BLOCK_DELETE]
    assert blocks[0]["header"][HDR_INSTANT_TIME] == "20240101000000000"
    got = decode_avro_data_block_content(
        blocks[0]["content"], schema
    )
    assert got == recs
    dels = decode_delete_block_content(blocks[1]["content"])
    assert dels == [{"recordKey": "k1", "partitionPath": "lang=en",
                     "orderingVal": None}]


def test_log_block_corruption_detected():
    blob = bytearray(
        encode_log_block(BLOCK_DELETE, {HDR_INSTANT_TIME: "1"},
                         encode_delete_block_content([("k", "")]))
    )
    blob[-1] ^= 0xFF  # flip a trailer byte
    with pytest.raises(ValueError, match="size mismatch"):
        parse_log_file(bytes(blob))
    with pytest.raises(ValueError, match="magic"):
        parse_log_file(b"NOTHUDI" + bytes(blob))


def test_mor_snapshot_merges_logs(spark, mor):
    path, _, _ = mor
    assert table_properties(path)["hoodie.table.type"] == "MERGE_ON_READ"
    got = {r.id: r.text for r in read_hudi(spark, path).collect()}
    exp = {
        i: f"doc {i}" for i in range(12) if i not in (7, 8)
    }
    exp[4] = "UPDATED-AGAIN"  # second upsert beats the first
    exp[5] = "UPDATED5"
    assert got == exp


def test_mor_time_travel_by_delta_instant(spark, mor):
    path, _, (i1, i2, i3, _) = mor
    assert read_hudi(spark, path, as_of_instant=i1).count() == 12
    d2 = {r.id: r.text for r in
          read_hudi(spark, path, as_of_instant=i2).collect()}
    assert d2[4] == "UPDATED" and d2[7] == "doc 7"
    d3 = read_hudi(spark, path, as_of_instant=i3)
    assert d3.count() == 10  # 7, 8 tombstoned; update to 4 still v1


def test_compaction_resets_log_chain(spark, mor):
    path, w, _ = mor
    before = {r.id: r.text for r in read_hudi(spark, path).collect()}
    ic = w.compact(ts_ms=5000)
    # after compaction every group is pure parquet again — the CoW
    # fast path plans it without any log merge
    groups, _ = plan_file_groups(path)
    assert all(not g["logs"] for g in groups.values())
    files, _ = plan_snapshot(path)  # no longer raises
    assert files
    after = {r.id: r.text for r in read_hudi(spark, path).collect()}
    assert after == before
    # post-compaction log appends target the new base slice
    w.upsert_log([{"id": 0, "lang": "en", "text": "POST-COMPACT"}],
                 ts_ms=6000)
    got = {r.id: r.text for r in read_hudi(spark, path).collect()}
    assert got[0] == "POST-COMPACT"


def test_plan_snapshot_raises_on_pending_logs(mor):
    path, _, _ = mor
    with pytest.raises(ValueError, match="MERGE_ON_READ"):
        plan_snapshot(path)


def test_mor_partition_pruning_at_plan_time(spark, mor):
    path, _, _ = mor
    df = read_hudi(
        spark, path, partition_filter=lambda p: p == "lang=en"
    )
    got = {r.id: r.text for r in df.collect()}
    exp = {i: f"doc {i}" for i in range(0, 12, 2) if i != 8}
    exp[4] = "UPDATED-AGAIN"
    assert got == exp


def test_incremental_query_mor(spark, mor):
    from kafka_delta_ingest_spark.hudi import read_hudi_incremental

    path, _, (i1, i2, i3, i4) = mor
    # (i1, i2]: exactly the first upsert's two rows, at their updated
    # versions
    got = {(r.id, r.text) for r in
           read_hudi_incremental(spark, path, i1, i2).collect()}
    assert got == {(4, "UPDATED"), (5, "UPDATED5")}
    # (i1, i4]: latest version of every changed record; deletes (7, 8)
    # don't surface
    got = {(r.id, r.text) for r in
           read_hudi_incremental(spark, path, i1).collect()}
    assert got == {(4, "UPDATED-AGAIN"), (5, "UPDATED5")}
    # (i2, i4]: the second upsert only
    got = {(r.id, r.text) for r in
           read_hudi_incremental(spark, path, i2).collect()}
    assert got == {(4, "UPDATED-AGAIN")}


def test_incremental_query_shared_snapshot(spark, mor):
    # A consumer polling one table state with several watermarks can
    # hand the keep_meta=True snapshot to each pull via snapshot=...;
    # every windowed pull must equal its independently-planned twin.
    from kafka_delta_ingest_spark.hudi import read_hudi_incremental

    path, _, (i1, i2, i3, i4) = mor
    snap = read_hudi(spark, path, keep_meta=True).localCheckpoint(
        eager=False
    )
    for begin in (i1, i2, i3):
        shared = {(r.id, r.text) for r in read_hudi_incremental(
            spark, path, begin, snapshot=snap).collect()}
        solo = {(r.id, r.text) for r in read_hudi_incremental(
            spark, path, begin).collect()}
        assert shared == solo


def test_incremental_query_cow(spark, tmp_path):
    # CoW rewrites stamp the new instant only on rows they CHANGED —
    # unchanged neighbors in the rewritten file keep their original
    # commit time, so the incremental filter excludes them.
    from kafka_delta_ingest_spark.hudi import (
        HudiFixtureWriter,
        read_hudi_incremental,
    )

    w = HudiFixtureWriter(
        str(tmp_path / "c"), record_key="id", partition_field="lang"
    )
    rows = [
        {"id": i, "lang": ["en", "fr"][i % 2], "text": f"doc {i}"}
        for i in range(8)
    ]
    i1 = w.insert(rows, ts_ms=1000)
    w.upsert([{"id": 2, "lang": "en", "text": "V2"}], ts_ms=2000)
    got = {(r.id, r.text) for r in
           read_hudi_incremental(spark, str(tmp_path / "c"), i1).collect()}
    assert got == {(2, "V2")}  # not the 3 unchanged en-file neighbors


def test_mor_keep_meta_exposes_record_key(spark, mor):
    path, _, _ = mor
    df = read_hudi(spark, path, keep_meta=True)
    assert "_hoodie_record_key" in df.columns
    keys = {r._hoodie_record_key for r in df.collect()}
    assert "4" in keys and "7" not in keys


def test_same_key_in_two_partitions_not_collapsed(spark, tmp_path):
    # r8 ADVICE (medium): Hudi's default non-global index scopes
    # record keys PER PARTITION — the MOR merge must group on
    # (partition_path, record_key), and a delete block tombstones only
    # its own partition's row.
    t = str(tmp_path / "np")
    w = HudiMorFixtureWriter(
        t, record_key="id", schema=_SCHEMA, partition_field="lang",
    )
    w.insert(
        [
            {"id": 1, "lang": "en", "text": "english 1"},
            {"id": 1, "lang": "fr", "text": "french 1"},
            {"id": 2, "lang": "en", "text": "english 2"},
            {"id": 2, "lang": "fr", "text": "french 2"},
        ],
        ts_ms=1000,
    )
    # update id=1 ONLY in fr (upsert_log appends a data block to every
    # group holding the key — scope via a one-partition delete next)
    w.delete_log([2], ts_ms=2000, partition="lang=en")
    got = sorted(
        (r.id, r.lang, r.text) for r in read_hudi(spark, t).collect()
    )
    # both id=1 rows survive (distinct partitions); id=2 survives in fr
    assert got == [
        (1, "en", "english 1"),
        (1, "fr", "french 1"),
        (2, "fr", "french 2"),
    ]


def test_rollback_command_block_invalidates_target_instant(spark, mor):
    """r8 (closes the r7 seam): a ROLLBACK command block neutralizes
    every PRIOR block of its target instant within the same log file —
    Hudi's crash-recovery marker for a failed write's orphan blocks
    (HoodieLogRecordReader contract). Orphan rows must not surface;
    unrelated blocks survive."""
    import glob
    import json as _json

    from kafka_delta_ingest_spark.hudi import (
        HDR_COMMAND_BLOCK_TYPE,
        HDR_TARGET_INSTANT_TIME,
        encode_avro_data_block_content,
        encode_log_block,
    )

    t, w, _instants = mor
    before = sorted(
        (r.id, r.text) for r in read_hudi(spark, t).collect()
    )
    # a failed write appended orphan data blocks (instant never
    # completed), then the next writer appended the rollback marker
    log = sorted(glob.glob(t + "/*/.*.log.*"))[0]
    schema = {
        "type": "record",
        "name": "r",
        "fields": [
            {"name": "_hoodie_record_key", "type": ["null", "string"]},
            {"name": "id", "type": ["null", "long"]},
            {"name": "lang", "type": ["null", "string"]},
            {"name": "text", "type": ["null", "string"]},
        ],
    }
    bad_instant = "99999999999999999"
    orphan = encode_log_block(
        BLOCK_AVRO_DATA,
        {HDR_INSTANT_TIME: bad_instant,
         HDR_SCHEMA: _json.dumps(schema)},
        encode_avro_data_block_content(
            [{"_hoodie_record_key": "0", "id": 0, "lang": "en",
              "text": "ORPHAN MUST NOT SURFACE"}],
            schema,
        ),
    )
    rollback = encode_log_block(
        0,  # BLOCK_COMMAND
        {HDR_TARGET_INSTANT_TIME: bad_instant,
         HDR_COMMAND_BLOCK_TYPE: "0"},
        b"",
    )
    with open(log, "ab") as f:
        f.write(orphan)
        f.write(rollback)
    after = sorted(
        (r.id, r.text) for r in read_hudi(spark, t).collect()
    )
    assert after == before  # orphan invalidated, nothing else changed
    assert all("ORPHAN" not in txt for _, txt in after)


def test_pandas_to_naive_ns_handles_tz_aware_and_us():
    """The vectorized MoR record build must normalize BOTH the
    datetime64[us] series Arrow usually hands over AND tz-aware
    series (session time-zone configs), where a plain
    .astype('datetime64[ns]') raises TypeError on pandas 2.x (r10
    advice, hudi.py). Aware values convert as UTC wall time —
    matching the per-cell pd.Timestamp(v).value path this replaced."""
    import pandas as pd

    from kafka_delta_ingest_spark.hudi import _pandas_to_naive_ns

    naive_us = pd.Series(
        pd.to_datetime(["2024-01-01 12:00:00", None]).astype(
            "datetime64[us]"
        )
    )
    out = _pandas_to_naive_ns(naive_us)
    assert str(out.dtype) == "datetime64[ns]"
    assert out.iloc[0] == pd.Timestamp("2024-01-01 12:00:00")
    assert pd.isna(out.iloc[1])

    aware = pd.Series(
        pd.to_datetime(
            ["2024-01-01 12:00:00+05:00", "2024-06-01 00:30:00+05:00"]
        )
    )
    out2 = _pandas_to_naive_ns(aware)
    assert str(out2.dtype) == "datetime64[ns]"
    assert out2.iloc[0] == pd.Timestamp("2024-01-01 07:00:00")
    # epoch-µs equals what pd.Timestamp(v).value // 1000 produced
    assert out2.to_numpy(dtype="int64")[1] // 1000 == (
        pd.Timestamp("2024-06-01 00:30:00+05:00").value // 1000
    )
