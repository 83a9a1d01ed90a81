"""Word-level Kneser-Ney bigram language model — train and score,
distributed, pure Catalyst.

Perplexity filtering with a small n-gram LM is the classic corpus
quality gate (the CCNet recipe scores documents with a KenLM model
and keeps the fluent band).  `operators/terms.charlm_perplexity` is
the dependency-free char-level analog; this module adds the WORD
level with the real smoothing: interpolated Kneser-Ney, the method
KenLM defaults to, computed entirely with DataFrame aggregations —

    P_KN(w | v) = max(c(v,w) - d, 0) / c(v)
                + d * N1+(v,*) / c(v) * P_cont(w)
    P_cont(w)   = N1+(*,w) / N1+(*,*)

where N1+ are distinct-continuation counts and ``d`` the absolute
discount.  Scoring applies the standard interpolation ladder per
bigram: seen pair -> P_KN; unseen pair with seen history ->
backoff(v) * P_cont(w); unseen history -> P_cont(w); out-of-vocab
word -> d / N1+(*,*) (a deterministic floor).

Shape for scale: ONE token-bigram explode feeds the pair counts
(map-side combine collapses them to vocabulary-squared-bounded
rows); the three model tables join back onto per-document pairs by
token keys — plain shuffle equi-joins that AQE converts to
broadcast when the model is small.  No Python in the loop, no
driver collection.  The reference repo has no LM surface (LLM
pipeline addition, SURVEY.md §2.8).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["train_kneser_ney", "score_kneser_ney", "kn_perplexity"]


def _token_bigrams(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, v, w) rows: lowercase alnum tokens, consecutive pairs via
    one linear zip_with pass (no positional substring scans)."""
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"),
        lambda t: t != "",
    )
    df = df.select(F.col(id_col).alias("_id"), toks.alias("_t"))
    df = df.where(F.size("_t") >= 2)
    pairs = F.zip_with(
        F.slice(F.col("_t"), 1, F.size("_t") - 1),
        F.slice(F.col("_t"), 2, F.size("_t") - 1),
        lambda a, b: F.struct(a.alias("v"), b.alias("w")),
    )
    return df.select("_id", F.explode(pairs).alias("_p")).select(
        "_id", F.col("_p.v").alias("v"), F.col("_p.w").alias("w")
    )


def train_kneser_ney(
    df: DataFrame, id_col: str, text_col: str, discount: float = 0.75,
    materialize: bool = True,
) -> dict:
    """Train on a corpus; returns the model as a dict of DataFrames:
    ``pairs (v, w, p)`` — the interpolated KN probability of every
    seen bigram, ``backoff (v, bow)`` — the history backoff weight
    ``d * N1+(v,*) / c(v)``, ``cont (w, pcont)`` — the continuation
    distribution, and ``consts (n1pp, floor)``.

    ``materialize`` (default) eagerly checkpoints the bigram counts
    ``c_vw`` — the model's sufficient statistic, bounded by distinct
    bigram TYPES (vocabulary-squared worst case), never corpus size.
    Every model table and the scoring ladder's three joins derive
    from it: left lazy, Catalyst re-runs the corpus tokenize +
    explode + count for each reference (measured: 9 Generate nodes /
    10 scans / 0 ReusedExchange in q:kn_perplexity's plan) — at
    100 TB that is nine corpus passes instead of one."""
    bi = _token_bigrams(df, id_col, text_col)
    c_vw = bi.groupBy("v", "w").agg(F.count(F.lit(1)).alias("c_vw"))
    if materialize:
        c_vw = c_vw.localCheckpoint(eager=True)
    c_v = c_vw.groupBy("v").agg(
        F.sum("c_vw").alias("c_v"),
        F.count(F.lit(1)).alias("n1p_v"),  # N1+(v,*)
    )
    cont_w = c_vw.groupBy("w").agg(F.count(F.lit(1)).alias("n1p_w"))
    consts = c_vw.agg(F.count(F.lit(1)).alias("n1pp"))
    d = F.lit(discount)
    cont = cont_w.crossJoin(F.broadcast(consts)).select(
        "w", (F.col("n1p_w") / F.col("n1pp")).alias("pcont")
    )
    backoff = c_v.select(
        "v", (d * F.col("n1p_v") / F.col("c_v")).alias("bow")
    )
    pairs = (
        c_vw.join(c_v, "v")
        .join(cont, "w")
        .select(
            "v",
            "w",
            (
                F.greatest(F.col("c_vw") - d, F.lit(0.0)) / F.col("c_v")
                + d * F.col("n1p_v") / F.col("c_v") * F.col("pcont")
            ).alias("p"),
        )
    )
    return {
        "pairs": pairs,
        "backoff": backoff,
        "cont": cont,
        "consts": consts.select(
            "n1pp", (d / F.col("n1pp")).alias("floor")
        ),
    }


def score_kneser_ney(
    df: DataFrame, model: dict, id_col: str, text_col: str
) -> DataFrame:
    """Score documents under a trained model: per-doc mean log
    probability over token bigrams and the perplexity
    ``exp(-avg_logp)``.  The interpolation ladder (seen pair /
    backoff / continuation / OOV floor) is a CASE over three left
    equi-joins.  Documents with fewer than two tokens return NULL
    scores (kept via left join).  Returns ``(id, n_bigrams,
    avg_logp, ppl)``."""
    bi = _token_bigrams(df, id_col, text_col)
    doc_bg = bi.groupBy("_id", "v", "w").agg(F.count(F.lit(1)).alias("c"))
    joined = (
        doc_bg.join(model["pairs"], ["v", "w"], "left")
        .join(model["backoff"], "v", "left")
        .join(model["cont"], "w", "left")
        .crossJoin(F.broadcast(model["consts"]))
    )
    p = F.coalesce(
        F.col("p"),
        F.col("bow") * F.col("pcont"),
        F.col("pcont"),
        F.col("floor"),
    )
    scored = joined.groupBy("_id").agg(
        F.sum("c").alias("n_bigrams"),
        (F.sum(F.col("c") * F.log(p)) / F.sum("c")).alias("avg_logp"),
    )
    ids = df.select(F.col(id_col).alias("_id")).distinct()
    return (
        ids.join(scored, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
            "avg_logp",
            F.exp(-F.col("avg_logp")).alias("ppl"),
        )
    )


def kn_perplexity(
    df: DataFrame,
    id_col: str,
    text_col: str,
    discount: float = 0.75,
    score_col: str | None = None,
) -> DataFrame:
    """Train on ``text_col`` and score ``score_col`` (defaults to the
    training column) in one job — the self-trained corpus-outlier
    shape of `charlm_perplexity`, at word level with real KN
    smoothing.  Pass a perturbed ``score_col`` to exercise the
    backoff/OOV paths."""
    model = train_kneser_ney(df, id_col, text_col, discount)
    return score_kneser_ney(df, model, id_col, score_col or text_col)
