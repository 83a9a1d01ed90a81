"""Chunked-target DSIR: per-domain models + quota cuts
(operators/dsir.dsir_resample_domains)."""


def test_dsir_resample_domains(spark):
    from pyspark.sql import functions as F

    from vtk_reserves_spark.operators.dsir import dsir_resample_domains

    docs = spark.createDataFrame(
        [(i, f"alpha beta w{i % 7} w{i % 3}", "a" if i % 2 else "b")
         for i in range(40)],
        "doc_id long, text string, domain string",
    )
    target = docs.filter(F.col("doc_id") % 5 == 0)
    out = dsir_resample_domains(
        docs, target, quotas={"a": 4, "b": 6}, domain_col="domain",
        n_buckets=32,
    ).toPandas()
    assert sorted(out.groupby("domain").size().items()) == [
        ("a", 4), ("b", 6),
    ]
    # ranks are 1..quota within each domain
    assert sorted(out[out["domain"] == "a"]["rank"]) == [1, 2, 3, 4]
    # deterministic
    out2 = dsir_resample_domains(
        docs, target, quotas={"a": 4, "b": 6}, domain_col="domain",
        n_buckets=32,
    ).toPandas()
    assert sorted(out["doc_id"]) == sorted(out2["doc_id"])
    # a quota domain absent from the corpora contributes nothing
    out3 = dsir_resample_domains(
        docs, target, quotas={"a": 2, "zzz": 5}, domain_col="domain",
        n_buckets=32,
    ).toPandas()
    assert set(out3["domain"]) == {"a"} and len(out3) == 2
    # missing columns gate
    import pytest as _pytest

    with _pytest.raises(ValueError, match="missing"):
        dsir_resample_domains(
            docs.drop("domain"), target, quotas={"a": 1},
            domain_col="domain",
        )


def test_dsir_target_within_raw_bit_identical(spark):
    """target_within_raw=True (target model from a semi-join of the
    materialized raw features) must reproduce the recomputed-target
    result EXACTLY: bucket counts are integer sums, so the smoothed
    model vectors — and every downstream weight/rank — are
    bit-identical."""
    from pyspark.sql import functions as F

    from vtk_reserves_spark.operators.dsir import (
        dsir_resample, dsir_resample_domains,
    )

    docs = spark.createDataFrame(
        [(i, f"tok{i % 11} alpha tok{i % 5} beta w{i % 3}",
          "a" if i % 2 else "b")
         for i in range(60)],
        "doc_id long, text string, domain string",
    )
    target = docs.filter(F.col("doc_id") % 4 == 0)

    base = dsir_resample(
        docs, target, k=12, n_buckets=32
    ).orderBy("rank").collect()
    fast = dsir_resample(
        docs, target, k=12, n_buckets=32, target_within_raw=True
    ).orderBy("rank").collect()
    assert base == fast

    base_d = dsir_resample_domains(
        docs, target, quotas={"a": 5, "b": 7}, domain_col="domain",
        n_buckets=32,
    ).orderBy("domain", "rank").collect()
    fast_d = dsir_resample_domains(
        docs, target, quotas={"a": 5, "b": 7}, domain_col="domain",
        n_buckets=32, target_within_raw=True,
    ).orderBy("domain", "rank").collect()
    assert base_d == fast_d
