"""Deterministic sampling and corpus-mixture operators.

North-star additions (SURVEY.md §2.8): assembling a training corpus
means *sampling* sources to a target mixture — downsampling
over-represented strata and upsampling scarce ones (epoch repetition).
``df.sample()`` is wrong for this at scale: its RNG is seeded per
partition, so results change whenever partitioning changes, and no SQL
oracle can reproduce them.  Every operator here decides membership from
``md5(seed_id)`` — a pure column expression, so the sample is

- **reproducible**: same rows selected on any cluster layout, any
  engine (the DuckDB oracles run the identical arithmetic);
- **incremental**: re-running over a grown corpus keeps every
  previously selected row (membership depends only on the row id);
- **pushdown-friendly**: the predicate sits directly above the scan,
  no shuffle, no state.

Design for 100 TB: all three operators are narrow (filter / generate)
— zero shuffles, trivially parallel, and the hash predicate reads only
the id and stratum columns until the final projection.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: hash-bucket resolution: fractions are quantized to 1/MOD
MOD = 1_000_000


def md5_bucket(
    id_col: Column, modulus, seed: str | None = None, signed_mod: bool = True
) -> Column:
    """Uniform bucket in [0, modulus) from md5 of the row id — the first
    8 hex digits as an integer, reduced mod ``modulus`` (same md5-prefix
    construction as the dedup hashes, so every SQL oracle is one
    expression).  ``seed`` optionally prefixes the hashed string;
    ``signed_mod=False`` uses ``pmod`` (callers that declared pmod in
    their oracle, e.g. sequence packing)."""
    keyed = (
        F.concat(F.lit(f"{seed}_"), id_col.cast("string"))
        if seed is not None
        else id_col.cast("string")
    )
    h = F.conv(F.substring(F.md5(keyed), 1, 8), 16, 10).cast("long")
    return h % modulus if signed_mod else F.pmod(h, modulus)


def hash_bucket(id_col: Column, seed: str = "samp") -> Column:
    """Sampling bucket in [0, MOD): see :func:`md5_bucket`."""
    return md5_bucket(id_col, MOD, seed=seed)


def _thr(fraction: float) -> int:
    return int(round(fraction * MOD))


def hash_sample(
    df: DataFrame, id_col: str, fraction: float, seed: str = "samp"
) -> DataFrame:
    """Deterministic Bernoulli sample: keep rows whose hash bucket falls
    below ``fraction`` — a pure filter, stable under repartitioning.

    Rows with a NULL ``id_col`` are EXCLUDED at every fraction (a
    deterministic hash needs an identity; their membership would
    otherwise be an arbitrary engine-specific NULL-comparison
    accident).  Assign surrogate ids upstream if NULL-id rows must be
    sampleable."""
    return df.where(hash_bucket(F.col(id_col), seed) < F.lit(_thr(fraction)))


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    id_col: str,
    seed: str = "samp",
    default: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sampling: stratum s keeps
    ``fractions[s]`` of its rows (``default`` for unlisted strata).
    The per-stratum threshold compiles to one CASE expression, so the
    whole operator is a single narrow filter."""
    thr: Column = F.lit(_thr(default))
    for value, frac in sorted(fractions.items()):
        thr = F.when(F.col(strata_col) == value, F.lit(_thr(frac))).otherwise(thr)
    return df.where(hash_bucket(F.col(id_col), seed) < thr)


def mix_corpus(
    df: DataFrame,
    strata_col: str,
    weights: dict[str, float],
    id_col: str,
    seed: str = "mix",
    default: float = 1.0,
) -> DataFrame:
    """Weighted corpus mixture with epoch upsampling: stratum s appears
    ``weights[s]`` times in expectation.  A row is emitted with
    ``epoch = 1..floor(w)`` unconditionally; the fractional part of w
    admits one extra epoch for ``frac(w)`` of the rows, decided by the
    per-(row, epoch) hash — e.g. w=2.5 duplicates every row twice and
    half the rows a third time.  w<1 downsamples (epoch 1 only, kept
    with probability w).

    This is the standard LLM data-mixture step (domain weights /
    dataset epochs).  Plan shape: one generated ``epoch`` array +
    explode + filter — narrow, no shuffle; output order carries the
    ``epoch`` column so downstream shuffles (or the oracle compare)
    see a deterministic multiset."""
    ceil_w: Column = F.lit(int(math.ceil(default)))
    thr_last: Column = F.lit(_thr(default - math.floor(default)))
    floor_w: Column = F.lit(int(math.floor(default)))
    for value, w in sorted(weights.items()):
        is_v = F.col(strata_col) == value
        ceil_w = F.when(is_v, F.lit(int(math.ceil(w)))).otherwise(ceil_w)
        floor_w = F.when(is_v, F.lit(int(math.floor(w)))).otherwise(floor_w)
        thr_last = F.when(is_v, F.lit(_thr(w - math.floor(w)))).otherwise(thr_last)
    out = df.withColumn(
        "epoch", F.explode(F.sequence(F.lit(1), F.greatest(ceil_w, F.lit(1))))
    )
    keep_full = F.col("epoch") <= floor_w
    keep_frac = hash_bucket(
        F.concat(F.col(id_col).cast("string"), F.lit("#"), F.col("epoch").cast("string")),
        seed,
    ) < thr_last
    return out.where(keep_full | keep_frac)


def quota_sample(
    df: DataFrame, key_col: str, k: int, id_col: str, seed: str = "quota"
) -> DataFrame:
    """Per-key quota: keep at most ``k`` rows per key, chosen
    deterministically by md5 rank (ties broken by id) — the
    per-domain cap every CC-derived corpus applies to stop site
    dominance.  Same reproducibility contract as the other samplers:
    membership depends only on (key, id), never on partitioning, and
    the DuckDB oracle is one ROW_NUMBER expression.

    Plan shape: ONE shuffle on the key + a window ``row_number`` —
    the minimum for an exact per-key cap.  Skew note: a hot key's
    rows land in one task; at 100 TB pre-thin pathological keys with
    ``hash_sample`` (cheap, shuffle-free) down to O(k/eps) candidates
    first, then apply the exact quota."""
    from pyspark.sql import Window

    w = Window.partitionBy(key_col).orderBy(
        hash_bucket(F.col(id_col), seed).asc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("_quota_rn", F.row_number().over(w))
        .where(F.col("_quota_rn") <= k)
        .drop("_quota_rn")
    )
