"""Apache Iceberg table reader — metadata/manifest replay without the
iceberg-spark runtime.

The second lakehouse format next to Delta (`sources/delta.py`), with
a public spec (iceberg.apache.org/spec/).  An Iceberg snapshot is
fully described by metadata files, so a reader is a metadata walk:

1. ``metadata/version-hint.text`` (the Hadoop-catalog convention)
   names the current ``vN.metadata.json``;
2. the table metadata JSON carries ``snapshots`` (each with a
   ``manifest-list`` Avro path) and ``current-snapshot-id``;
3. the manifest LIST (Avro) enumerates manifest files; each
   MANIFEST (Avro) holds entries ``(status, data_file{file_path,
   file_format, record_count, ...})`` — status 2 = deleted;
4. surviving parquet files are handed to ``spark.read.parquet``.

Both Avro layers decode through the in-repo Avro codec
(`sources/avro.py` — the full complex-type system from round 5),
so no external library is involved anywhere.

**v2 position deletes are supported Spark-natively**: delete files
(parquet of ``file_path, pos``) become a broadcast LEFT-ANTI join
against the scan's hidden ``_metadata.file_path``/``row_index``
columns, so the data path stays a native Catalyst read.  Gating
(never silently misread): ``format-version`` > 2, equality deletes,
and non-parquet data files raise clear errors.

Scale posture: identical to Delta — metadata is driver-side (KBs;
the same place iceberg-spark plans scans), the data path is one
distributed Catalyst parquet scan with pushdown/pruning intact.
Time travel = pick a ``snapshot_id``.

Fixture writers emit spec-shaped metadata (subset schemas with the
spec's field names) so the reader round-trips under the driver
oracle (q:iceberg_snapshot).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

__all__ = [
    "iceberg_snapshot", "read_iceberg",
    "write_iceberg_table", "append_iceberg_snapshot",
]

_MANIFEST_ENTRY_SCHEMA = {
    "type": "record",
    "name": "manifest_entry",
    "fields": [
        {"name": "status", "type": "int"},
        {"name": "snapshot_id", "type": ["null", "long"], "default": None},
        {
            "name": "data_file",
            "type": {
                "type": "record",
                "name": "r2",
                "fields": [
                    {"name": "content", "type": "int", "default": 0},
                    {"name": "file_path", "type": "string"},
                    {"name": "file_format", "type": "string"},
                    {"name": "record_count", "type": "long"},
                    {"name": "file_size_in_bytes", "type": "long"},
                ],
            },
        },
    ],
}

_MANIFEST_LIST_SCHEMA = {
    "type": "record",
    "name": "manifest_file",
    "fields": [
        {"name": "manifest_path", "type": "string"},
        {"name": "manifest_length", "type": "long"},
        {"name": "partition_spec_id", "type": "int"},
        {"name": "content", "type": "int", "default": 0},
        {"name": "added_snapshot_id", "type": ["null", "long"],
         "default": None},
    ],
}


def _resolve(table: str, path: str) -> str:
    if path.startswith("file://"):
        path = path[len("file://"):]
    if os.path.isabs(path):
        return path
    return os.path.join(table, path)


def _read_avro_rows(path: str) -> list[dict]:
    from vtk_reserves_spark.sources.avro import read_avro_bytes

    with open(path, "rb") as fh:
        _, rows = read_avro_bytes(fh.read())
    return rows


def _load_table_metadata(table: str) -> dict:
    mdir = os.path.join(table, "metadata")
    hint = os.path.join(mdir, "version-hint.text")
    if os.path.exists(hint):
        with open(hint) as fh:
            v = fh.read().strip()
        cand = os.path.join(mdir, f"v{v}.metadata.json")
    else:  # newest vN.metadata.json
        versions = []
        if os.path.isdir(mdir):
            for name in os.listdir(mdir):
                if name.startswith("v") and name.endswith(".metadata.json"):
                    try:
                        versions.append(int(name[1:-len(".metadata.json")]))
                    except ValueError:
                        continue
        if not versions:
            raise ValueError(f"iceberg: no metadata json under {mdir}")
        cand = os.path.join(mdir, f"v{max(versions)}.metadata.json")
    with open(cand) as fh:
        meta = json.load(fh)
    fv = int(meta.get("format-version", 1))
    if fv > 2:
        raise ValueError(f"iceberg: format-version {fv} not supported")
    return meta


def iceberg_snapshot(table: str, snapshot_id: int | None = None) -> dict:
    """Metadata walk -> ``{"files": [paths], "snapshot_id",
    "schema": iceberg schema dict}``."""
    meta = _load_table_metadata(table)
    snaps = meta.get("snapshots") or []
    if not snaps:
        return {
            "files": [],
            "snapshot_id": None,
            "schema": meta.get("schemas", [meta.get("schema")])[0],
        }
    sid = snapshot_id if snapshot_id is not None else meta.get(
        "current-snapshot-id"
    )
    snap = next((s for s in snaps if s["snapshot-id"] == sid), None)
    if snap is None:
        raise ValueError(
            f"iceberg: snapshot {sid} not in "
            f"{[s['snapshot-id'] for s in snaps]}"
        )
    files: list[str] = []
    delete_files: list[str] = []
    for mf in _read_avro_rows(_resolve(table, snap["manifest-list"])):
        is_delete_manifest = int(mf.get("content") or 0) == 1
        for entry in _read_avro_rows(_resolve(table, mf["manifest_path"])):
            if int(entry["status"]) == 2:  # deleted
                continue
            df_ = entry["data_file"]
            content = int(df_.get("content") or 0)
            fmt = str(df_["file_format"]).upper()
            if fmt != "PARQUET":
                raise ValueError(
                    f"iceberg: data file format {fmt} not supported"
                )
            if content == 0 and not is_delete_manifest:
                files.append(_resolve(table, df_["file_path"]))
            elif content == 1:  # position deletes (v2)
                delete_files.append(_resolve(table, df_["file_path"]))
            else:
                raise ValueError(
                    "iceberg: equality deletes not supported"
                )
    schema = meta.get("schemas")
    if schema:
        cur = meta.get("current-schema-id", 0)
        schema = next(
            (s for s in schema if s.get("schema-id") == cur), schema[0]
        )
    else:
        schema = meta.get("schema")
    return {"files": sorted(set(files)), "snapshot_id": sid,
            "delete_files": sorted(set(delete_files)),
            "schema": schema}


def read_iceberg(
    spark: SparkSession, table: str, snapshot_id: int | None = None
) -> DataFrame:
    """Iceberg table -> DataFrame (current or time-traveled
    snapshot); the scan is plain distributed parquet with
    ``basePath`` so hive-style partition dirs reconstruct.

    **v2 position deletes** apply Spark-natively: the scan adds the
    hidden ``_metadata.file_path``/``row_index`` columns and
    LEFT-ANTI joins the (file_path, pos) pairs from the snapshot's
    delete files — the delete side is broadcast (position-delete
    files are orders of magnitude smaller than data; a pathological
    delete volume falls back to a shuffled anti-join via AQE).  The
    data scan itself stays a native Catalyst parquet read."""
    from pyspark.sql import functions as F

    snap = iceberg_snapshot(table, snapshot_id)
    if not snap["files"]:
        raise ValueError("iceberg: snapshot has no data files")
    reader = spark.read.option("basePath", table)
    if not snap["delete_files"]:
        return reader.parquet(*snap["files"])
    data = reader.parquet(*snap["files"]).withColumns({
        "_ice_path": F.regexp_replace("_metadata.file_path", "^file:", ""),
        "_ice_pos": F.col("_metadata.row_index"),
    })
    # normalize delete-side paths the same way: strip file:, resolve
    # relative paths against the table root
    root = table.rstrip("/") + "/"
    dels = (
        spark.read.parquet(*snap["delete_files"])
        .select(
            F.when(
                F.col("file_path").startswith("file:"),
                F.regexp_replace("file_path", "^file:", ""),
            )
            .when(
                F.col("file_path").startswith("/"), F.col("file_path")
            )
            .otherwise(F.concat(F.lit(root), F.col("file_path")))
            .alias("_ice_path"),
            F.col("pos").alias("_ice_pos"),
        )
    )
    return data.join(
        F.broadcast(dels), ["_ice_path", "_ice_pos"], "left_anti"
    ).drop("_ice_path", "_ice_pos")


# ------------------------------------------------------------- fixtures


def write_iceberg_table(table: str, schema_fields: list[dict]) -> dict:
    """Create metadata/v1.metadata.json (no snapshots yet) +
    version-hint; returns the metadata dict for appends."""
    mdir = os.path.join(table, "metadata")
    os.makedirs(mdir, exist_ok=True)
    meta = {
        "format-version": 1,
        "table-uuid": f"fixture-{os.path.basename(table)}",
        "location": table,
        "last-updated-ms": 0,
        "last-column-id": len(schema_fields),
        "schema": {"type": "struct", "fields": schema_fields},
        "partition-spec": [],
        "properties": {},
        "snapshots": [],
    }
    with open(os.path.join(mdir, "v1.metadata.json"), "w") as fh:
        json.dump(meta, fh)
    with open(os.path.join(mdir, "version-hint.text"), "w") as fh:
        fh.write("1")
    return meta


def append_iceberg_snapshot(
    table: str,
    snapshot_id: int,
    data_files: list[dict],
    deleted_files: list[str] | None = None,
    position_deletes: list[tuple[str, int]] | None = None,
) -> None:
    """Add a snapshot: writes one manifest (adds + deletions of
    prior files), the manifest list, and the next vN.metadata.json.
    ``data_files``: dicts with file_path (+ record_count/size).
    ``position_deletes``: (data_file_relpath, row_pos) pairs — writes
    a v2 position-delete parquet + a content-1 delete manifest."""
    from vtk_reserves_spark.sources.avro import write_avro_bytes

    meta = _load_table_metadata(table)
    mdir = os.path.join(table, "metadata")
    entries = [
        {
            "status": 1,
            "snapshot_id": snapshot_id,
            "data_file": {
                "content": 0,
                "file_path": d["file_path"],
                "file_format": "parquet",
                "record_count": int(d.get("record_count", 0)),
                "file_size_in_bytes": int(d.get("size", 0)),
            },
        }
        for d in data_files
    ]
    # carry forward the previous snapshot's surviving files so each
    # manifest list is self-contained (the simple "rewrite" strategy)
    if meta.get("snapshots"):
        prev = iceberg_snapshot(table)
        dropped = set(deleted_files or [])
        for p in prev["files"]:
            rel = os.path.relpath(p, table)
            if rel in dropped or p in dropped:
                continue
            entries.append({
                "status": 0,
                "snapshot_id": snapshot_id,
                "data_file": {
                    "content": 0, "file_path": rel,
                    "file_format": "parquet",
                    "record_count": 0, "file_size_in_bytes": 0,
                },
            })
    man_rel = f"metadata/snap-{snapshot_id}-manifest.avro"
    man_path = os.path.join(table, man_rel)
    blob = write_avro_bytes(_MANIFEST_ENTRY_SCHEMA, entries)
    with open(man_path, "wb") as fh:
        fh.write(blob)
    ml_rows = [{
        "manifest_path": man_rel,
        "manifest_length": len(blob),
        "partition_spec_id": 0,
        "content": 0,
        "added_snapshot_id": snapshot_id,
    }]
    # v2 position deletes: delete parquet (file_path, pos) + a
    # content-1 delete manifest; prior delete files carry forward
    del_entries = []
    if meta.get("snapshots"):
        prev = iceberg_snapshot(table)
        for p in prev.get("delete_files", []):
            del_entries.append({
                "status": 0, "snapshot_id": snapshot_id,
                "data_file": {
                    "content": 1,
                    "file_path": os.path.relpath(p, table),
                    "file_format": "parquet",
                    "record_count": 0, "file_size_in_bytes": 0,
                },
            })
    if position_deletes:
        import pyarrow as pa
        import pyarrow.parquet as pq

        del_rel = f"metadata/snap-{snapshot_id}-deletes.parquet"
        pq.write_table(
            pa.table({
                "file_path": pa.array(
                    [p for p, _ in position_deletes], pa.string()
                ),
                "pos": pa.array(
                    [int(x) for _, x in position_deletes], pa.int64()
                ),
            }),
            os.path.join(table, del_rel),
        )
        del_entries.append({
            "status": 1, "snapshot_id": snapshot_id,
            "data_file": {
                "content": 1, "file_path": del_rel,
                "file_format": "parquet",
                "record_count": len(position_deletes),
                "file_size_in_bytes": os.path.getsize(
                    os.path.join(table, del_rel)
                ),
            },
        })
    if del_entries:
        dman_rel = f"metadata/snap-{snapshot_id}-delete-manifest.avro"
        dblob = write_avro_bytes(_MANIFEST_ENTRY_SCHEMA, del_entries)
        with open(os.path.join(table, dman_rel), "wb") as fh:
            fh.write(dblob)
        ml_rows.append({
            "manifest_path": dman_rel,
            "manifest_length": len(dblob),
            "partition_spec_id": 0,
            "content": 1,
            "added_snapshot_id": snapshot_id,
        })
    ml_rel = f"metadata/snap-{snapshot_id}-manifest-list.avro"
    with open(os.path.join(table, ml_rel), "wb") as fh:
        fh.write(write_avro_bytes(_MANIFEST_LIST_SCHEMA, ml_rows))
    meta = dict(meta)
    meta["snapshots"] = list(meta.get("snapshots") or []) + [
        {"snapshot-id": snapshot_id, "timestamp-ms": 0,
         "manifest-list": ml_rel,
         "summary": {"operation": "append"}}
    ]
    meta["current-snapshot-id"] = snapshot_id
    hint = os.path.join(mdir, "version-hint.text")
    with open(hint) as fh:
        v = int(fh.read().strip())
    with open(os.path.join(mdir, f"v{v + 1}.metadata.json"), "w") as fh:
        json.dump(meta, fh)
    with open(hint, "w") as fh:
        fh.write(str(v + 1))
