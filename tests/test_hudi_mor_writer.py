"""HudiMorWriter — production MERGE_ON_READ write path.

Inserts land as base parquet (deltacommit); updates/deletes append
HoodieLogFormat blocks EXECUTOR-SIDE (one applyInPandas task per
touched file group encodes its Avro/delete block with the pure-Python
codec); compact() folds the blocks into new base slices as a .commit.
Every read goes through the independent read_hudi timeline walk + log
merge — the same path that reads the fixture writer's MoR tables, so
the production writer is certified against the established reader.
"""

import json
import os

import pytest
from pyspark.sql import functions as F

from kafka_delta_ingest_spark.hudi import (
    HudiMorWriter,
    parse_log_file,
    plan_file_groups,
    read_hudi,
    read_hudi_incremental,
)


def _df(spark, rows, schema="id long, s string, v double"):
    return spark.createDataFrame(rows, schema)


def _seed(spark, t, partitioned=False):
    if partitioned:
        w = HudiMorWriter(t, partition_by=["p"], record_key="id")
        w.insert_batch(
            spark.createDataFrame(
                [(1, "a", "x"), (2, "a", "y"), (3, "b", "z")],
                "id long, p string, s string",
            ).coalesce(1)
        )
        return w
    w = HudiMorWriter(t, record_key="id")
    w.insert_batch(
        _df(spark, [(i, f"old{i}", float(i)) for i in range(10)])
        .coalesce(1)
    )
    w.insert_batch(
        _df(spark, [(i, f"old{i}", float(i)) for i in range(10, 20)])
        .coalesce(1)
    )
    return w


def test_mor_table_properties_and_deltacommit(spark, tmp_path):
    t = str(tmp_path / "m0")
    _seed(spark, t)
    props = open(os.path.join(t, ".hoodie", "hoodie.properties")).read()
    assert "MERGE_ON_READ" in props
    actions = [
        f for f in os.listdir(os.path.join(t, ".hoodie"))
        if f.endswith(".deltacommit")
    ]
    assert len(actions) == 2  # inserts commit as deltacommits


def test_upsert_log_appends_blocks_not_base_rewrites(spark, tmp_path):
    t = str(tmp_path / "m1")
    w = _seed(spark, t)
    bases_before = {
        f for f in os.listdir(t) if f.endswith(".parquet")
    }
    instant, n_log, n_ins, n_rec = w.upsert_log_batch(
        _df(spark, [(3, "NEW3", -3.0), (13, "NEW13", -13.0),
                    (100, "ins", 100.0)])
    )
    assert n_log == 2 and n_ins == 1
    # base files of the touched groups were NOT rewritten
    assert bases_before <= {
        f for f in os.listdir(t) if f.endswith(".parquet")
    }
    logs = [f for f in os.listdir(t) if ".log." in f]
    assert len(logs) == 2
    # the log files really are HoodieLogFormat avro data blocks
    blocks = parse_log_file(
        open(os.path.join(t, logs[0]), "rb").read()
    )
    assert blocks[0]["type"] == 3  # BLOCK_AVRO_DATA
    # read-back merges latest-wins through the independent reader
    got = {
        r["id"]: (r["s"], r["v"])
        for r in read_hudi(spark, t).collect()
    }
    assert len(got) == 21
    assert got[3] == ("NEW3", -3.0)
    assert got[13] == ("NEW13", -13.0)
    assert got[100] == ("ins", 100.0)
    assert got[4] == ("old4", 4.0)


def test_second_upsert_bumps_log_version(spark, tmp_path):
    t = str(tmp_path / "m2")
    w = _seed(spark, t)
    w.upsert_log_batch(_df(spark, [(3, "U1", 1.0)]))
    w.upsert_log_batch(_df(spark, [(3, "U2", 2.0)]))
    logs = sorted(f for f in os.listdir(t) if ".log." in f)
    assert len(logs) == 2
    assert logs[0].split(".log.")[1][0] == "1"
    assert logs[1].split(".log.")[1][0] == "2"
    got = {r["id"]: r["s"] for r in read_hudi(spark, t).collect()}
    assert got[3] == "U2"  # latest log version wins


def test_delete_log_tombstones_per_partition(spark, tmp_path):
    t = str(tmp_path / "m3")
    w = _seed(spark, t, partitioned=True)
    instant, n_log = w.delete_log_batch(
        spark.createDataFrame([(1, "a")], "id long, p string")
    )
    assert n_log == 1
    got = {(r["id"], r["p"]) for r in read_hudi(spark, t).collect()}
    # (1,a) gone; same-key-other-partition untouched (non-global index)
    assert got == {(2, "a"), (3, "b")}
    # deleting a key with no live record is a no-op
    assert w.delete_log_batch(
        spark.createDataFrame([(99, "a")], "id long, p string")
    ) == (None, 0)


def test_compact_folds_logs_into_new_slices(spark, tmp_path):
    t = str(tmp_path / "m4")
    w = _seed(spark, t)
    w.upsert_log_batch(_df(spark, [(3, "U1", 1.0), (13, "U13", 2.0)]))
    w.delete_log_batch(_df(spark, [(5, "x", 0.0)]).select("id"))
    before = sorted(
        map(tuple, read_hudi(spark, t).collect())
    )
    instant = w.compact(spark)
    assert instant is not None
    # snapshots byte-identical across compaction
    after = sorted(map(tuple, read_hudi(spark, t).collect()))
    assert before == after
    # log chains reset: no group carries logs anymore, and the
    # folded log files are physically reclaimed
    groups, _ = plan_file_groups(t)
    assert all(not g["logs"] for g in groups.values())
    assert not [f for f in os.listdir(t) if ".log." in f]
    # the compacted groups kept their fileIds at the new instant
    meta = json.load(
        open(os.path.join(t, ".hoodie", f"{instant}.commit"))
    )
    assert meta["operationType"] == "COMPACT"
    assert all(
        st["path"].endswith(f"_{instant}.parquet")
        for stats in meta["partitionToWriteStats"].values()
        for st in stats
    )
    # compaction with nothing to fold is a no-op
    assert w.compact(spark) is None


def test_mor_incremental_serves_log_updates(spark, tmp_path):
    t = str(tmp_path / "m5")
    w = _seed(spark, t)
    first = sorted(
        f[: -len(".deltacommit")]
        for f in os.listdir(os.path.join(t, ".hoodie"))
        if f.endswith(".deltacommit")
    )[-1]
    w.upsert_log_batch(_df(spark, [(3, "NEW3", -3.0)]))
    inc = read_hudi_incremental(spark, t, begin_instant=first)
    rows = {r["id"]: r["s"] for r in inc.collect()}
    assert rows == {3: "NEW3"}


def test_unmappable_column_type_raises(spark, tmp_path):
    t = str(tmp_path / "m6")
    w = _seed(spark, t)
    with pytest.raises(ValueError, match="Avro mapping"):
        w.upsert_log_batch(
            spark.createDataFrame(
                [(3, bytearray(b"x"))], "id long, blob binary"
            )
        )


def test_streaming_upsert_into_mor_destination(spark, tmp_path):
    """DeltaStreamer's continuous UPSERT operation re-expressed: the
    ingest loop streams into log_format='hudi_mor' with a record key —
    batch 2's corrections append log blocks to the owning group while
    its new keys base-insert, exactly-once offsets ride in the
    deltacommit extraMetadata, and a replay of batch 2 skips."""
    import json as _json

    from pyspark.sql import Row
    from pyspark.sql.types import StringType, StructField, StructType

    from kafka_delta_ingest_spark.ingest import IngestJob, IngestOptions

    table = str(tmp_path / "mor_stream")
    opts = IngestOptions(
        topic="t", table_uri=table, app_id="ms", transforms={},
        log_format="hudi_mor", record_key="id",
    )
    schema = StructType(
        [StructField("id", StringType()),
         StructField("color", StringType())]
    )
    job = IngestJob(opts, schema)

    def raw(rows, lo):
        return spark.createDataFrame(
            [
                Row(
                    value=bytearray(_json.dumps(p).encode()),
                    partition=0,
                    offset=lo + i,
                    topic="t",
                    timestamp=None,
                    timestampType=0,
                )
                for i, p in enumerate(rows)
            ],
            "value binary, partition int, offset long, topic string, "
            "timestamp timestamp, timestampType int",
        )

    b1 = raw([{"id": str(i), "color": "red"} for i in range(10)], 0)
    m1 = job.run_batch(b1)
    assert not m1.skipped and m1.delta_write_num_records == 10

    b2 = raw(
        [{"id": "3", "color": "BLUE"}, {"id": "7", "color": "GREEN"},
         {"id": "10", "color": "new"}],
        10,
    )
    m2 = job.run_batch(b2)
    assert not m2.skipped
    # corrections hit the log; the new key base-inserted
    assert [f for f in os.listdir(table) if ".log." in f]
    got = {r["id"]: r["color"] for r in read_hudi(spark, table).collect()}
    assert len(got) == 11
    assert got["3"] == "BLUE" and got["7"] == "GREEN"
    assert got["10"] == "new" and got["4"] == "red"
    # exactly-once: replaying batch 2 skips
    assert job.run_batch(b2).skipped
    # auto-optimize on the MoR leg = log compaction
    assert job.table.optimize(spark) is not None
    assert not [f for f in os.listdir(table) if ".log." in f]
    got2 = {r["id"]: r["color"] for r in read_hudi(spark, table).collect()}
    assert got2 == got


def test_compact_fully_deleted_group_writes_empty_slice(
    spark, tmp_path
):
    """r12 regression: a file group whose rows are ALL tombstoned by
    delete blocks yields ZERO merged rows at compaction — previously
    no new slice was written for it while its folded log file was
    physically reclaimed, so the next snapshot read re-planned
    (base + missing log) and crashed. compact() now writes an EMPTY
    base slice with the merged schema: later-base-wins retires the
    log chain and the group scans as zero rows."""
    t = str(tmp_path / "mor")
    w = _seed(spark, t)  # two file groups: ids 0-9 and 10-19
    # tombstone EVERY row of the first group, one row of the second
    w.delete_log_batch(
        _df(spark, [(i, "", 0.0) for i in range(10)]).select("id")
    )
    w.delete_log_batch(_df(spark, [(10, "", 0.0)]).select("id"))
    assert sorted(
        r.id for r in read_hudi(spark, t).select("id").collect()
    ) == list(range(11, 20))
    assert w.compact(spark) is not None
    # post-compact: no logs left, snapshot identical, empty slice real
    assert not [
        f for _dp, _d, fs in os.walk(t) for f in fs if ".log." in f
    ]
    assert sorted(
        r.id for r in read_hudi(spark, t).select("id").collect()
    ) == list(range(11, 20))
