"""DSIR — Data Selection with Importance Resampling (Xie et al.
2023, "Data Selection for Language Models via Importance Resampling",
arXiv:2302.03169): pick raw-corpus documents whose hashed-n-gram
distribution looks like a TARGET corpus.

The pipeline (paper §3, re-expressed Spark-first):

1. **Features** — every document reduces to hashed n-gram bucket
   counts: unigrams + bigrams of the normalized tokens, md5-hashed
   into ``n_buckets`` buckets (md5 so the SQL oracle replays the
   exact bucketing — `operators/dedup._word_hash`).
2. **Bag-of-n-grams models** — bucket-count totals over the target
   and the raw corpus give two smoothed categorical distributions
   ``p`` (target) and ``q`` (raw); both are ``n_buckets`` numbers,
   collected driver-side (KBs) like every codebook in this repo.
3. **Importance weights** — per document,
   ``log w = sum_b cnt_b * (log p_b - log q_b)``: one broadcast join
   of the per-doc features against the bucket log-likelihood-ratio
   relation + one hash aggregation.
4. **Resampling** — Gumbel top-k (sampling without replacement
   proportional to ``w``): key = ``log w + Gumbel(0,1)`` with the
   Gumbel noise derived from a DETERMINISTIC md5 uniform per doc id,
   so runs are reproducible and SQL-replayable.  ``gumbel=False``
   degrades to plain top-k by weight (the argmax variant).

Scale shape: features are one explode + hash aggregation over the
corpus (shuffle keyed by (doc, bucket)); the two model vectors are
metadata; the weight pass is a broadcast join; the final cut is
``orderBy().limit(k)`` — Spark's TakeOrderedAndProject, a
per-partition top-k merged on the driver, never a global sort.  At
100 TB nothing here is quadratic and no row-scale relation reaches
the driver.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, functions as F

from vtk_reserves_spark.functions.text import (
    normalize_text,
    ordered_shingles_of_tokens,
    tokens,
)
from vtk_reserves_spark.operators.dedup import _word_hash
from vtk_reserves_spark.operators.sampling import MOD, md5_bucket

__all__ = [
    "dsir_resample",
    "dsir_resample_domains",
    "dsir_weights",
    "hashed_ngram_counts",
]


def hashed_ngram_counts(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 256,
    seed: str = "dsir",
) -> DataFrame:
    """Documents -> ``(id, bucket, cnt)`` hashed n-gram features
    (unigrams + ordered bigrams, duplicates kept — the paper's
    feature units).  One explode + ONE hash aggregation; documents
    with no tokens simply contribute no rows (their weight is 0 by
    definition).  The token array materializes in its own projection
    first — higher-order-function lambdas re-evaluate outer subtrees
    per element, so building shingles straight off the tokenizer
    expression would re-tokenize each document once per bigram (the
    `functions/text.shingles` hot-path note)."""
    if n_buckets <= 0:
        raise ValueError("dsir: n_buckets must be positive")
    t = F.col("_t")
    g = df.select(
        F.col(id_col),
        tokens(normalize_text(F.col(text_col))).alias("_t"),
    ).select(
        F.col(id_col),
        F.explode(
            F.concat(t, ordered_shingles_of_tokens(t, 2))
        ).alias("_g"),
    )
    return (
        g.withColumn(
            "bucket",
            F.pmod(_word_hash(F.col("_g"), seed), F.lit(n_buckets))
            .cast("int"),
        )
        .groupBy(id_col, "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _bucket_logprobs(
    feats: DataFrame, n_buckets: int, alpha: float
) -> list[float]:
    """Bucket totals -> smoothed log-probabilities
    ``log((c_b + alpha) / (total + alpha * B))`` — at most
    ``n_buckets`` rows to the driver."""
    rows = feats.groupBy("bucket").agg(F.sum("cnt").alias("c")).collect()
    counts = [0.0] * n_buckets
    for r in rows:
        counts[int(r["bucket"])] = float(r["c"])
    total = sum(counts)
    denom = total + alpha * n_buckets
    if denom <= 0:
        raise ValueError("dsir: empty corpus and zero smoothing")
    return [math.log((c + alpha) / denom) for c in counts]


def dsir_weights(
    raw: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 256,
    alpha: float = 1.0,
    seed: str = "dsir",
    target_within_raw: bool = False,
) -> DataFrame:
    """``raw`` with an extra ``log_w`` column: the log importance
    weight of each document under the target/raw bag-of-n-grams
    ratio.  Token-less documents get ``log_w = 0``.

    ``target_within_raw=True`` declares that every ``target`` row is
    also a ``raw`` row (same id => same text).  The target's feature
    rows are then a semi-join of the already-materialized raw
    features against the target ids instead of a second tokenize +
    explode + aggregation pass over the target text — one corpus
    pass instead of two.  Bucket counts are integer sums, so the
    derived model is bit-identical to the recomputed one.

    PRECONDITION (not validated — the flag trusts the caller):
    target ids must be UNIQUE and every one PRESENT in ``raw`` with
    identical text.  An id absent from raw is silently dropped by
    the semi-join, and a duplicated id counts once where recompute
    mode would count its buckets per occurrence — either misuse
    yields a silently wrong target model, not an error.  When unsure,
    leave the flag off; the default recomputes from ``target``."""
    raw_feats = hashed_ngram_counts(
        raw, id_col, text_col, n_buckets, seed
    )
    # the raw feature relation is consumed twice (q model + per-doc
    # weights): truncate its lineage once
    raw_feats = raw_feats.localCheckpoint()
    if target_within_raw:
        tgt_feats = raw_feats.join(
            target.select(id_col), id_col, "left_semi"
        )
    else:
        tgt_feats = hashed_ngram_counts(
            target, id_col, text_col, n_buckets, seed
        )
    logp = _bucket_logprobs(tgt_feats, n_buckets, alpha)
    logq = _bucket_logprobs(raw_feats, n_buckets, alpha)
    llr = raw.sparkSession.createDataFrame(
        [(b, logp[b] - logq[b]) for b in range(n_buckets)],
        "bucket int, llr double",
    )
    w = (
        raw_feats.join(F.broadcast(llr), "bucket")
        .groupBy(id_col)
        .agg(F.sum(F.col("cnt") * F.col("llr")).alias("log_w"))
    )
    return raw.join(w, id_col, "left").withColumn(
        "log_w", F.coalesce(F.col("log_w"), F.lit(0.0))
    )


def dsir_resample(
    raw: DataFrame,
    target: DataFrame,
    k: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 256,
    alpha: float = 1.0,
    seed: str = "dsir",
    gumbel: bool = True,
    target_within_raw: bool = False,
) -> DataFrame:
    """Select ``k`` raw documents by importance resampling: Gumbel
    top-k over ``log_w`` (= sampling without replacement with
    probability proportional to the importance weight — the paper's
    resampling step), with the Gumbel noise seeded from md5 of the
    doc id so the draw is deterministic and oracle-replayable.
    Returns the selected rows with ``log_w``, ``key`` (the perturbed
    score) and ``rank``.  ``target_within_raw`` as in
    :func:`dsir_weights` (reuse raw features for the target model).

    The cut is ``orderBy(key desc, id).limit(k)`` —
    TakeOrderedAndProject (per-partition heap + driver merge of
    ``partitions * k`` rows), never a single-partition sort."""
    wdf = dsir_weights(
        raw, target, id_col, text_col, n_buckets, alpha, seed,
        target_within_raw=target_within_raw,
    )
    if gumbel:
        # u in (0, 1): (h + 0.5) / MOD over the md5 bucket
        u = (
            md5_bucket(
                F.col(id_col), MOD, seed=f"g{seed}", signed_mod=False
            ).cast("double")
            + F.lit(0.5)
        ) / F.lit(float(MOD))
        key = F.col("log_w") + (-F.log(-F.log(u)))
    else:
        key = F.col("log_w")
    ranked = (
        wdf.withColumn("key", key)
        .orderBy(F.col("key").desc(), F.col(id_col).asc())
        .limit(k)
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.col("key").desc(), F.col(id_col).asc())
    return ranked.withColumn(
        "rank", F.row_number().over(w).cast("int")
    )


def _domain_logprobs(
    feats_by_domain: DataFrame, n_buckets: int, alpha: float
) -> dict[str, list[float]]:
    """(domain, bucket) totals -> per-domain smoothed
    log-probability vectors.  At most ``domains * n_buckets`` rows
    reach the driver — the per-domain twin of
    :func:`_bucket_logprobs`, with the same metadata-sized ceiling
    (document-scale domain counts belong in the quota map anyway)."""
    rows = (
        feats_by_domain.groupBy("_domain", "bucket")
        .agg(F.sum("cnt").alias("c"))
        .collect()
    )
    counts: dict[str, list[float]] = {}
    for r in rows:
        counts.setdefault(
            r["_domain"], [0.0] * n_buckets
        )[int(r["bucket"])] = float(r["c"])
    out = {}
    for d, cs in counts.items():
        denom = sum(cs) + alpha * n_buckets
        out[d] = [math.log((c + alpha) / denom) for c in cs]
    return out


def dsir_resample_domains(
    raw: DataFrame,
    target: DataFrame,
    quotas: dict[str, int],
    domain_col: str = "domain",
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 256,
    alpha: float = 1.0,
    seed: str = "dsir",
    gumbel: bool = True,
    target_within_raw: bool = False,
) -> DataFrame:
    """CHUNKED-target DSIR (the paper's target-mixture practice +
    quota sampling): each domain gets its OWN bag-of-n-grams target
    and raw models — a document's importance weight is the LLR
    against ITS domain's models — and the resampling cut takes
    ``quotas[domain]`` documents per domain (deterministic Gumbel
    top-k within the domain).  Domains absent from ``quotas``
    contribute nothing.

    Scale shape: features compute ONCE over each corpus (one explode
    + hash agg); the per-domain model vectors collect driver-side
    (``domains x n_buckets`` — metadata); weights are one broadcast
    (domain, bucket)->llr join + hash agg; the quota cut is one
    window ranked within the domain (a single shuffle keyed by
    domain; per-domain quotas are how a 100 TB mixture pipeline
    balances sources without a global sort).

    ``target_within_raw=True`` declares every ``target`` row is also
    a ``raw`` row (same id => same text/domain); the target feature
    rows then semi-join off the materialized raw features instead of
    re-tokenizing the target slice (see :func:`dsir_weights`)."""
    missing = [c for c in (domain_col, id_col, text_col)
               if c not in raw.columns]
    if missing:
        raise ValueError(f"dsir: raw is missing columns {missing}")
    if domain_col not in target.columns:
        raise ValueError(f"dsir: target is missing {domain_col!r}")
    doms = sorted(quotas)
    raw_d = raw.filter(F.col(domain_col).isin(doms))
    tgt_d = target.filter(F.col(domain_col).isin(doms))
    raw_feats = hashed_ngram_counts(
        raw_d, id_col, text_col, n_buckets, seed
    ).join(
        raw_d.select(
            F.col(id_col), F.col(domain_col).alias("_domain")
        ),
        id_col,
    ).localCheckpoint()
    if target_within_raw:
        tgt_feats = raw_feats.join(
            tgt_d.select(id_col), id_col, "left_semi"
        )
    else:
        tgt_feats = hashed_ngram_counts(
            tgt_d, id_col, text_col, n_buckets, seed
        ).join(
            tgt_d.select(
                F.col(id_col), F.col(domain_col).alias("_domain")
            ),
            id_col,
        )
    logp = _domain_logprobs(tgt_feats, n_buckets, alpha)
    logq = _domain_logprobs(raw_feats, n_buckets, alpha)
    llr_rows = [
        (d, b, logp[d][b] - logq[d][b])
        for d in doms if d in logp and d in logq
        for b in range(n_buckets)
    ]
    if not llr_rows:
        raise ValueError("dsir: no quota domain present in both "
                         "corpora")
    llr = raw.sparkSession.createDataFrame(
        llr_rows, "_domain string, bucket int, llr double"
    )
    w = (
        raw_feats.join(F.broadcast(llr), ["_domain", "bucket"])
        .groupBy(id_col)
        .agg(F.sum(F.col("cnt") * F.col("llr")).alias("log_w"))
    )
    wdf = raw_d.join(w, id_col, "left").withColumn(
        "log_w", F.coalesce(F.col("log_w"), F.lit(0.0))
    )
    if gumbel:
        u = (
            md5_bucket(
                F.col(id_col), MOD, seed=f"g{seed}", signed_mod=False
            ).cast("double")
            + F.lit(0.5)
        ) / F.lit(float(MOD))
        key = F.col("log_w") + (-F.log(-F.log(u)))
    else:
        key = F.col("log_w")
    from pyspark.sql import Window

    win = Window.partitionBy(F.col(domain_col)).orderBy(
        F.col("key").desc(), F.col(id_col).asc()
    )
    qdf = raw.sparkSession.createDataFrame(
        [(d, int(k)) for d, k in quotas.items()],
        f"{domain_col} string, _quota int",
    )
    return (
        wdf.withColumn("key", key)
        .withColumn("rank", F.row_number().over(win).cast("int"))
        .join(F.broadcast(qdf), domain_col)
        .filter(F.col("rank") <= F.col("_quota"))
        .drop("_quota")
    )
