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
    pins the round-10 rotation (ROTATION.json) so an accidental
    reorder cannot silently drop the evidence-due block out of the
    window."""
    import __spark_entry__ as entry

    names = list(entry.queries())
    window = set(names[:50])
    # the layout is the explicit _WINDOW list — exactly the window
    assert names[:50] == entry._WINDOW
    # head: the new oracle-backed round-10 queries
    round10_new = {"cdc_hudi", "lakehouse_update",
                   "iceberg_delete_mor", "delta_delete",
                   "delta_evolution", "stream_hudi_sink",
                   "iceberg_v3_dv", "iceberg_evolution_deletes"}
    # queries whose IMPLEMENTATION changed in round 10 (lakehouse
    # tier: CDF mapping, partitioned evolution, delete-aware
    # changelog, verb routing, instant/snapshot-id allocation)
    impl_changed = {"iceberg_changelog", "cdc_reverse",
                    "cdc_replicate", "iceberg_compact_deletes",
                    "delta_cdf", "delta_cdf_drain", "delta_merge",
                    "delta_optimize", "hudi_mor", "hudi_merge",
                    "iceberg_merge", "iceberg_evolution",
                    "lakehouse_update"}
    assert round10_new <= window
    assert impl_changed <= window
    # fill = oldest-evidence (round-4/5 cohort per ROTATION.json)
    assert {"stream_warc", "webdataset", "zip_archive",
            "arrow_ipc"} <= window
    # VERDICT r6 item 3: no rows-only queries spend window slots —
    # every window entry must be oracle-backed
    oracles = set(entry.oracle_sql())
    assert window <= oracles, f"rows-only in window: {window - oracles}"
