"""Term-weighting operators over a document corpus.

North-star addition (SURVEY.md §2.8 text analysis; no reference
counterpart).  Classic TF-IDF with smoothed IDF, shaped for scale:
tokenize → explode once, aggregate term frequencies and document
frequencies from the SAME exploded frame, broadcast the (tiny) term→IDF
map back onto the tf pairs, and take per-document top-k with one keyed
window.  Two aggregations + one window = three shuffles total, each
linear in the token stream; nothing is collected to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from vtk_reserves_spark.functions.text import normalize_text, tokens


def tfidf_top_terms(
    df: DataFrame,
    id_col: str,
    text_col: str,
    top_k: int = 3,
    broadcast_idf: bool = True,
) -> DataFrame:
    """Top-``top_k`` terms per document by TF-IDF.

    ``score = tf · (ln((N + 1) / (df + 1)) + 1)`` (smoothed IDF —
    sklearn's ``smooth_idf`` formula, exactly reproducible in SQL).
    Ties break by term ascending so the result is deterministic.
    Returns ``(id, term, tf, score, rank)``.

    The term→IDF map is VOCABULARY-sized (one row per distinct token),
    not constant-sized: broadcasting it is right for corpora whose
    vocabulary fits comfortably on the driver (millions of terms), but
    a web-scale crawl can exceed 10⁸ distinct tokens — pass
    ``broadcast_idf=False`` there to use a shuffled hash join on
    ``term`` instead, which degrades gracefully where a forced
    broadcast would OOM.
    """
    tok = df.select(
        F.col(id_col).alias("_id"),
        F.explode(tokens(normalize_text(F.col(text_col)))).alias("term"),
    )
    tf = tok.groupBy("_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    doc_freq = tok.groupBy("term").agg(F.count_distinct("_id").alias("_df"))
    n_docs = df.select(F.count(F.lit(1)).alias("_n"))
    idf = doc_freq.crossJoin(F.broadcast(n_docs)).select(
        "term",
        (F.log((F.col("_n") + 1) / (F.col("_df") + 1)) + 1).alias("_idf"),
    )
    scored = tf.join(
        F.broadcast(idf) if broadcast_idf else idf, "term"
    ).select(
        "_id", "term", "tf", (F.col("tf") * F.col("_idf")).alias("score")
    )
    w = Window.partitionBy("_id").orderBy(F.col("score").desc(), F.col("term").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= top_k)
        .select(F.col("_id").alias(id_col), "term", "tf", "score", "rank")
    )


def repetition_signals(
    df: DataFrame, id_col: str, text_col: str, n: int = 2
) -> DataFrame:
    """Repetition-based quality signal (the Gopher/Dolma
    ``rep_top_ngram`` rule): the fraction of a document's word
    ``n``-grams taken by its single most frequent one — high values
    mark boilerplate/spam for filtering.

    Documents with fewer than ``n`` tokens are dropped (no n-grams).
    Returns ``(id, n_grams, top_count, top_frac)``.  Shape: explode
    ordered grams, count per (doc, gram), reduce per doc — two hash
    aggregations.  (Hash partitioning on (_id, gram) does NOT satisfy a
    distribution on (_id) alone, so the second groupBy pays its own
    exchange — but over the already-reduced per-gram counts, not the
    raw gram stream.)"""
    from vtk_reserves_spark.functions.text import ordered_shingles_of_tokens

    tok = df.select(
        F.col(id_col).alias("_id"),
        tokens(normalize_text(F.col(text_col))).alias("_t"),
    ).where(F.size("_t") >= n)
    grams = tok.select(
        "_id", F.explode(ordered_shingles_of_tokens(F.col("_t"), n)).alias("gram")
    )
    per_gram = grams.groupBy("_id", "gram").agg(F.count(F.lit(1)).alias("c"))
    return per_gram.groupBy("_id").agg(
        F.sum("c").alias("n_grams"),
        F.max("c").alias("top_count"),
        (F.max("c") / F.sum("c")).alias("top_frac"),
    ).select(F.col("_id").alias(id_col), "n_grams", "top_count", "top_frac")


def charlm_perplexity(
    df: DataFrame, id_col: str, text_col: str, alpha: float = 0.5
) -> DataFrame:
    """Character-bigram language-model perplexity — the CCNet-style
    fluency signal (Wenzek et al. 2020 score corpora with a small LM
    and filter on perplexity; a char bigram model is the
    dependency-free analog).  The model is trained ON THE CORPUS
    ITSELF in the same job: bigram counts with add-``alpha`` smoothing
    over the observed second-character vocabulary give
    ``P(c2 | c1) = (n(c1 c2) + alpha) / (n(c1 ·) + alpha · V)``, and
    each document scores ``ppl = exp(-mean log P)`` over its bigrams.
    Outlier documents (mojibake, binary spew, repeated-char padding)
    sit far from the corpus model and surface with high perplexity.

    Shape for scale: ONE bigram explode feeds both the model counts
    and the per-document counts (two hash aggregations with map-side
    combine — the model side collapses to ~|charset|² rows no matter
    the corpus size); the trained log-prob table broadcasts back onto
    the per-document pairs, and one keyed aggregation reduces to the
    score.  No driver collection, no Python UDF; every expression is
    Catalyst.  Documents shorter than 2 characters have no bigrams and
    return NULL ``avg_logp``/``ppl`` (kept via left join).

    Returns ``(id, n_bigrams, avg_logp, ppl)``.
    """
    # bigrams as zip_with over a split-to-chars array, NOT positional
    # substring(_t, i, 2): UTF8String substring resolves codepoint i by
    # scanning from the string head, so per-index substring makes bigram
    # extraction O(len²) per document — measured 2.7x slower end-to-end
    # at sf0.1.  split+slice+zip_with is one linear pass per document.
    chars = F.split(F.col("_t"), "")
    bi = (
        df.select(F.col(id_col).alias("_id"), F.col(text_col).alias("_t"))
        .where(F.length("_t") >= 2)
        .select(
            "_id",
            F.explode(
                F.zip_with(
                    F.slice(chars, 1, F.size(chars) - 1),
                    F.slice(chars, 2, F.size(chars) - 1),
                    lambda a, b: F.concat(a, b),
                )
            ).alias("_bg"),
        )
    )
    doc_bg = bi.groupBy("_id", "_bg").agg(F.count(F.lit(1)).alias("_c"))
    # the model deliberately re-aggregates the RAW bigram stream rather
    # than doc_bg: its groupBy key is just the bigram (~|charset|²
    # groups), so map-side combine collapses it almost entirely, while
    # routing it through doc_bg was measured 2x SLOWER at sf0.1 (the
    # high-cardinality (doc, bigram) aggregation ran for both branches)
    # NOTE (optimization round r10): the model subtree is referenced by
    # tot/vsize/logp, so the corpus explode runs 4x in the plan (0
    # ReusedExchange).  Materializing it (localCheckpoint) was measured
    # 1.51x SLOWER end-to-end at sf0.1 — the eager job + RDD-scan
    # de-fusion costs more than the three cheap re-passes — so the lazy
    # form stays (guide §5: cache only when recompute beats the
    # pressure).
    model = bi.groupBy("_bg").agg(F.count(F.lit(1)).alias("_n12"))
    tot = (
        model.withColumn("_c1", F.substring("_bg", 1, 1))
        .groupBy("_c1")
        .agg(F.sum("_n12").alias("_n1"))
    )
    vsize = model.select(
        F.count_distinct(F.substring("_bg", 2, 1)).alias("_v")
    )
    logp = (
        model.withColumn("_c1", F.substring("_bg", 1, 1))
        .join(tot, "_c1")
        .crossJoin(F.broadcast(vsize))
        .select(
            "_bg",
            F.log(
                (F.col("_n12") + F.lit(alpha))
                / (F.col("_n1") + F.lit(alpha) * F.col("_v"))
            ).alias("_lp"),
        )
    )
    scored = (
        doc_bg.join(F.broadcast(logp), "_bg")
        .groupBy("_id")
        .agg(
            F.sum("_c").alias("n_bigrams"),
            (F.sum(F.col("_c") * F.col("_lp")) / F.sum("_c")).alias("avg_logp"),
        )
    )
    return (
        df.select(F.col(id_col))
        .join(scored.withColumnRenamed("_id", id_col), id_col, "left")
        .select(
            id_col,
            F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
            "avg_logp",
            F.exp(-F.col("avg_logp")).alias("ppl"),
        )
    )
