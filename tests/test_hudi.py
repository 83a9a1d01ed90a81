"""Hudi COPY_ON_WRITE timeline replay: snapshot resolution, file-group
supersession, replacecommit (insert_overwrite), time travel, gating."""
import json
import os

import pytest

from vtk_reserves_spark.sources.hudi import (
    hudi_snapshot,
    hudi_timeline,
    read_hudi,
    write_hudi,
)


def test_write_read_roundtrip_and_time_travel(spark, tmp_path):
    from pyspark.sql import functions as F

    t = str(tmp_path / "tbl")
    i1 = write_hudi(
        spark.range(10).withColumn("v", F.col("id") * 1.0), t
    )
    i2 = write_hudi(
        spark.range(10, 15).withColumn("v", F.col("id") * 1.0), t
    )
    assert i2 > i1
    got = sorted(r["id"] for r in read_hudi(spark, t).collect())
    assert got == list(range(15))
    old = sorted(
        r["id"] for r in read_hudi(spark, t, as_of=i1).collect()
    )
    assert old == list(range(10))


def test_replacecommit_insert_overwrite(spark, tmp_path):
    from pyspark.sql import functions as F

    t = str(tmp_path / "ovr")
    i1 = write_hudi(spark.range(10).withColumn("v", F.lit(1.0)), t)
    i2 = write_hudi(
        spark.range(100, 103).withColumn("v", F.lit(2.0)), t,
        mode="overwrite",
    )
    got = sorted(r["id"] for r in read_hudi(spark, t).collect())
    assert got == [100, 101, 102]
    # the replaced groups stay time-travelable
    assert sorted(
        r["id"] for r in read_hudi(spark, t, as_of=i1).collect()
    ) == list(range(10))
    tl = hudi_timeline(t)
    assert [a for _, a, _ in tl] == ["commit", "replacecommit"]
    assert tl[-1][0] == i2
    # appends after the overwrite land on top of the new state
    write_hudi(spark.range(200, 202).withColumn("v", F.lit(3.0)), t)
    assert sorted(
        r["id"] for r in read_hudi(spark, t).collect()
    ) == [100, 101, 102, 200, 201]


def test_partitioned_write_and_pruning_columns(spark, tmp_path):
    from pyspark.sql import functions as F

    t = str(tmp_path / "part")
    df = spark.range(20).withColumn(
        "b", (F.col("id") % 2).cast("int")
    ).withColumn("v", F.col("id") * 1.0)
    write_hudi(df, t, partition_by=["b"])
    back = read_hudi(spark, t)
    assert set(back.columns) == {"id", "b", "v"}
    rows = {r["id"]: r["b"] for r in back.collect()}
    assert rows == {i: i % 2 for i in range(20)}


def test_file_group_supersession(spark, tmp_path):
    """A commit rewriting an existing fileId under a newer instant
    supersedes the older base file (the CoW update shape)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = str(tmp_path / "fg")
    hdir = os.path.join(t, ".hoodie")
    os.makedirs(hdir)
    open(os.path.join(hdir, "hoodie.properties"), "w").write(
        "hoodie.table.name=fg\nhoodie.table.type=COPY_ON_WRITE\n"
    )

    def base(name, ids):
        pq.write_table(
            pa.table({"id": pa.array(ids, pa.int64())}),
            os.path.join(t, name),
        )

    base("f1_0-0-0_01.parquet", [1, 2])
    base("f2_0-0-0_01.parquet", [3])
    json.dump(
        {"partitionToWriteStats": {"": [
            {"fileId": "f1", "path": "f1_0-0-0_01.parquet"},
            {"fileId": "f2", "path": "f2_0-0-0_01.parquet"},
        ]}},
        open(os.path.join(hdir, "01.commit"), "w"),
    )
    # instant 02 rewrites group f1 (an update of rows 1,2 -> 1,2,9)
    base("f1_0-0-0_02.parquet", [1, 2, 9])
    json.dump(
        {"partitionToWriteStats": {"": [
            {"fileId": "f1", "path": "f1_0-0-0_02.parquet"},
        ]}},
        open(os.path.join(hdir, "02.commit"), "w"),
    )
    snap = hudi_snapshot(t)
    names = [os.path.basename(p) for p in snap["files"]]
    assert names == ["f1_0-0-0_02.parquet", "f2_0-0-0_01.parquet"]
    assert sorted(r["id"] for r in read_hudi(spark, t).collect()) == \
        [1, 2, 3, 9]
    # inflight markers are invisible
    open(os.path.join(hdir, "03.commit.inflight"), "w").write("{}")
    assert hudi_snapshot(t)["instant"] == "02"


def test_gating(spark, tmp_path):
    t = str(tmp_path / "gate")
    with pytest.raises(ValueError, match="hoodie.properties"):
        hudi_snapshot(t)
    hdir = os.path.join(t, ".hoodie")
    os.makedirs(hdir)
    open(os.path.join(hdir, "hoodie.properties"), "w").write(
        "hoodie.table.type=MERGE_ON_READ\n"
    )
    with pytest.raises(ValueError, match="MERGE_ON_READ"):
        hudi_snapshot(t)
    open(os.path.join(hdir, "hoodie.properties"), "w").write(
        "hoodie.table.type=COPY_ON_WRITE\n"
    )
    with pytest.raises(ValueError, match="no completed commits"):
        hudi_snapshot(t)


def test_hoodie_meta_columns_dropped(spark, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = str(tmp_path / "meta")
    hdir = os.path.join(t, ".hoodie")
    os.makedirs(hdir)
    open(os.path.join(hdir, "hoodie.properties"), "w").write(
        "hoodie.table.type=COPY_ON_WRITE\n"
    )
    pq.write_table(
        pa.table({
            "_hoodie_commit_time": pa.array(["01"], pa.string()),
            "_hoodie_record_key": pa.array(["k1"], pa.string()),
            "id": pa.array([7], pa.int64()),
        }),
        os.path.join(t, "f1_0-0-0_01.parquet"),
    )
    json.dump(
        {"partitionToWriteStats": {"": [
            {"fileId": "f1", "path": "f1_0-0-0_01.parquet"},
        ]}},
        open(os.path.join(hdir, "01.commit"), "w"),
    )
    assert read_hudi(spark, t).columns == ["id"]
    assert "_hoodie_record_key" in read_hudi(
        spark, t, drop_meta=False
    ).columns


def test_loader_dispatch_hudi(spark, tmp_path):
    from pyspark.sql import functions as F

    from vtk_reserves_spark.sources.loaders import load_dataframe
    from vtk_reserves_spark.sources.hudi import write_hudi

    t = str(tmp_path / "disp")
    write_hudi(spark.range(4).withColumn("v", F.lit(1.0)), t)
    assert load_dataframe(spark, t).count() == 4


def test_merge_hudi_upsert_and_delete(spark, tmp_path):
    """Record-key upsert: only the matched file groups are replaced
    (replacecommit), untouched groups carry forward, history stays
    time-travelable."""
    from pyspark.sql import functions as F

    from vtk_reserves_spark.sources.hudi import (
        hudi_snapshot, merge_hudi, read_hudi, write_hudi,
    )

    t = str(tmp_path / "upsert")
    df = spark.range(20).withColumn(
        "b", (F.col("id") % 2).cast("int")
    ).withColumn("v", F.col("id") * 1.0)
    i1 = write_hudi(df.repartition(4), t, partition_by=["b"])
    before = hudi_snapshot(t)
    src = spark.range(15, 23).withColumn(
        "b", (F.col("id") % 2).cast("int")
    ).withColumn("v", F.col("id") * 10.0)
    merge_hudi(spark, src, t, on=["id"])
    got = {r["id"]: r["v"] for r in read_hudi(spark, t).collect()}
    assert got == {
        **{i: float(i) for i in range(15)},
        **{i: i * 10.0 for i in range(15, 23)},
    }
    # pre-merge snapshot unchanged under time travel
    assert read_hudi(spark, t, as_of=i1).count() == 20
    # some original groups survived the replace (untouched carry)
    after = hudi_snapshot(t)
    survivors = set(before["files"]) & set(after["files"])
    assert survivors and set(after["files"]) != set(before["files"])
    # delete-merge
    merge_hudi(
        spark,
        spark.range(3).withColumn(
            "b", (F.col("id") % 2).cast("int")
        ).withColumn("v", F.lit(0.0)),
        t, on=["id"], when_matched="delete", when_not_matched="ignore",
    )
    assert sorted(
        r["id"] for r in read_hudi(spark, t).collect()
    ) == list(range(3, 23))
