"""Drive the full driver contract: every queries() entry runs and
hash-matches its oracle_sql() on the test scale factor — the same gate
the driver applies at sf0.01."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.conftest import assert_frames_match

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


def test_every_query_has_an_oracle_or_is_flagged():
    missing = set(ORACLES) - set(QUERIES)
    assert not missing, f"oracle_sql keys without queries: {missing}"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert len(df.schema.fields) > 0


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, duck, sf_dir):
    df = QUERIES[name](spark, sf_dir)
    if name not in ORACLES:
        assert df.count() >= 0  # weaker rows-only check (driver parity)
        return
    assert_frames_match(df, duck.sql(ORACLES[name]))


def test_recording_window_layout():
    """The driver records only the FIRST 50 queries() entries; this
    pins the round-6 rotation so an accidental reorder cannot
    silently drop the evidence-due block out of the window."""
    import __spark_entry__ as entry

    names = list(entry.queries())
    window = set(names[:50])
    # the 16 round-1 greens whose evidence sat past the r5 cap
    rotation_due = {"similarity_topk", "similarity_lsh",
                    "similarity_ivf", "embedding_near_dup",
                    "multimodal_features", "multimodal_resize",
                    "frame_sample", "rotated_grid", "grade_shells",
                    "mesh_decimate", "mesh_faces",
                    "mesh_explode_roundtrip", "proportional_volume",
                    "asof_join", "range_join", "time_rollup"}
    # new in round 6, plus the two whose implementation changed
    round6_new = {"gltf_mesh", "zarr_embeddings", "hdf5_embeddings",
                  "krige_closed", "pca_whiten",
                  "pca_whiten_degenerate", "quality_classifier",
                  "logreg_degenerate", "semantic_dedup",
                  "delta_snapshot", "iceberg_snapshot",
                  "hybrid_retrieval", "parquet_stats", "heif_metadata",
                  "safetensors_embeddings", "decompress",
                  "ngram_jaccard"}
    assert rotation_due <= window
    assert round6_new <= window
    # every window entry that is oracle-backed must have an oracle
    oracles = set(entry.oracle_sql())
    rows_only = {"krige", "indicator_krige", "simple_krige", "cokrige",
                 "krige_block", "bpe_merges", "pca_whiten",
                 "quality_classifier"}
    assert all(n in oracles for n in window - rows_only)
