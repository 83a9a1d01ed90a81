"""Iceberg metadata/manifest replay: snapshot resolution through the
in-repo Avro codec, multi-snapshot append + delete carry-forward,
time travel, version-hint handling, and feature gating."""
import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from vtk_reserves_spark.sources.iceberg import (
    append_iceberg_snapshot,
    iceberg_snapshot,
    read_iceberg,
    write_iceberg_table,
)

FIELDS = [
    {"id": 1, "name": "id", "required": False, "type": "long"},
    {"id": 2, "name": "v", "required": False, "type": "double"},
]


def _part(table, rel, ids):
    p = os.path.join(table, rel)
    os.makedirs(os.path.dirname(p), exist_ok=True)
    pq.write_table(
        pa.table({"id": pa.array(ids, pa.int64()),
                  "v": pa.array([i * 0.5 for i in ids], pa.float64())}),
        p,
    )
    return {"file_path": rel, "record_count": len(ids),
            "size": os.path.getsize(p)}


def test_single_snapshot(tmp_path, spark):
    t = str(tmp_path / "tbl")
    write_iceberg_table(t, FIELDS)
    a = _part(t, "data/a.parquet", [1, 2])
    append_iceberg_snapshot(t, 100, [a])
    snap = iceberg_snapshot(t)
    assert snap["snapshot_id"] == 100
    assert [os.path.basename(f) for f in snap["files"]] == ["a.parquet"]
    assert sorted(r["id"] for r in read_iceberg(spark, t).collect()) == [1, 2]


def test_multi_snapshot_and_time_travel(tmp_path, spark):
    t = str(tmp_path / "tbl")
    write_iceberg_table(t, FIELDS)
    a = _part(t, "data/a.parquet", [1])
    b = _part(t, "data/b.parquet", [2])
    append_iceberg_snapshot(t, 1, [a, b])
    c = _part(t, "data/c.parquet", [3])
    append_iceberg_snapshot(t, 2, [c], deleted_files=["data/b.parquet"])
    cur = iceberg_snapshot(t)
    assert cur["snapshot_id"] == 2
    assert [os.path.basename(f) for f in cur["files"]] == [
        "a.parquet", "c.parquet"
    ]
    assert sorted(r["id"] for r in read_iceberg(spark, t).collect()) == [1, 3]
    # time travel
    old = iceberg_snapshot(t, snapshot_id=1)
    assert [os.path.basename(f) for f in old["files"]] == [
        "a.parquet", "b.parquet"
    ]
    assert sorted(
        r["id"] for r in read_iceberg(spark, t, snapshot_id=1).collect()
    ) == [1, 2]


def test_gating(tmp_path):
    t = str(tmp_path / "tbl")
    write_iceberg_table(t, FIELDS)
    a = _part(t, "data/a.parquet", [1])
    append_iceberg_snapshot(t, 1, [a])
    # format-version 3 rejected
    mdir = os.path.join(t, "metadata")
    with open(os.path.join(mdir, "version-hint.text")) as fh:
        v = int(fh.read())
    mp = os.path.join(mdir, f"v{v}.metadata.json")
    meta = json.load(open(mp))
    meta["format-version"] = 3
    json.dump(meta, open(mp, "w"))
    with pytest.raises(ValueError, match="format-version"):
        iceberg_snapshot(t)
    meta["format-version"] = 2
    json.dump(meta, open(mp, "w"))
    assert iceberg_snapshot(t)["snapshot_id"] == 1
    # unknown snapshot id
    with pytest.raises(ValueError, match="snapshot 999"):
        iceberg_snapshot(t, snapshot_id=999)


def test_missing_metadata_rejected(tmp_path):
    with pytest.raises(ValueError, match="metadata"):
        iceberg_snapshot(str(tmp_path))


def test_newest_metadata_without_hint(tmp_path):
    t = str(tmp_path / "tbl")
    write_iceberg_table(t, FIELDS)
    a = _part(t, "data/a.parquet", [7])
    append_iceberg_snapshot(t, 5, [a])
    os.remove(os.path.join(t, "metadata", "version-hint.text"))
    snap = iceberg_snapshot(t)  # falls back to newest vN
    assert snap["snapshot_id"] == 5
