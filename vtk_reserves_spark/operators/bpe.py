"""Byte-pair-encoding vocabulary learning and encoding, Spark-native.

North-star training-pipeline addition (SURVEY.md §2.8): the tokenizer-
TRAINING step (Sennrich et al. 2016, "Neural Machine Translation of
Rare Words with Subword Units") — learn a merge table from corpus
statistics, then encode text with it.  The repo already counts tokens
with a fixed regex (`functions/text.py`); this learns the vocabulary
itself.

Scale design — the device that makes BPE distributable is that after
ONE pass over the corpus everything operates on the WORD-FREQUENCY
table, not the corpus (Heaps' law: distinct words ≪ corpus tokens):

- corpus → (word, count): one explode + one groupBy (map-side combine);
- each merge round: adjacent-pair explode over the word table → ONE
  groupBy(pair) → top-1 by (count DESC, pair ASC) — a deterministic
  tie-break so the merge sequence is reproducible bit-for-bit;
- the winning merge is applied to the word table by an Arrow-batched
  pandas UDF (merging is a sequential left-to-right scan inside each
  word — not expressible with Catalyst array functions — but each word
  is tiny and independent, so batch-level Python is the right tool);
- each round eagerly checkpoints the new word table (lineage
  truncation + materialization; retired rounds' blocks release via the
  ContextCleaner when their references drop), so K merges cost K small
  shuffles over the vocabulary, never K corpus passes.

Correctness is pinned against a pure-Python reference implementation
(same tie-break) in tests/test_llm_ops.py; the learned-merge query is
rows-only (an iterative fixed point has no SQL oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from vtk_reserves_spark.functions.text import tokens


def _merge_word(symbols: list, left: str, right: str) -> list:
    """Apply one merge to one word: leftmost-first sequential scan."""
    out = []
    i = 0
    n = len(symbols)
    while i < n:
        if i < n - 1 and symbols[i] == left and symbols[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(symbols[i])
            i += 1
    return out


def word_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus → (word, count): the one corpus-wide pass."""
    return (
        df.select(F.explode(tokens(F.lower(F.col(text_col)))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("count"))
    )


def _learn_bpe_local(counts: dict, num_merges: int, min_freq: int) -> list:
    """Driver-side learner over a collected (word -> count) dict — the
    SAME greedy rule and tie-break as the distributed rounds (the
    differential test in tests/test_llm_ops.py pins them to each
    other)."""
    vocab = {tuple(w): c for w, c in counts.items() if w}
    merges: list = []
    for _ in range(num_merges):
        pairs: dict = {}
        for syms, c in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + c
        if not pairs:
            break
        (a, b), f = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if f < min_freq:
            break
        merges.append((a, b, int(f)))
        vocab = {tuple(_merge_word(list(s), a, b)): c for s, c in vocab.items()}
    return merges


def learn_bpe(
    words: DataFrame,
    num_merges: int,
    min_freq: int = 2,
    driver_threshold: int = 100_000,
) -> list:
    """Learn ``num_merges`` BPE merges from a (word, count) table.

    Returns the ordered merge list ``[(left, right, freq), ...]``.
    Stops early when the best remaining pair's frequency drops below
    ``min_freq``.  Deterministic: ties break on the lexicographically
    smallest (left, right).

    Adaptive execution (the broadcast-threshold idea applied to
    tokenizer training): when the vocabulary has at most
    ``driver_threshold`` distinct words it is collected ONCE and the
    rounds run driver-side — every distributed round pays a shuffle +
    Python-worker + checkpoint overhead that dwarfs the actual work on
    a small vocab (measured ~5x on the bench corpus).  Larger
    vocabularies (real web corpora: 10-100M+ distinct words) keep the
    distributed rounds.  Both paths implement the identical rule, so
    the cutover does not change the learned merges."""
    # words is the ONE corpus-wide pass: persist it so the threshold
    # count and the chosen path's first read share a single scan
    words = words.persist()
    try:
        if driver_threshold and words.count() <= driver_threshold:
            counts = {r["word"]: r["count"] for r in words.collect()}
            return _learn_bpe_local(counts, num_merges, min_freq)
        sym = words.select(
            F.split(F.col("word"), "").alias("syms"),
            F.col("count").cast("long").alias("count"),
        ).where(F.size("syms") > 0)
        # eager checkpoint (not persist): each round reads only the
        # PREVIOUS round's table, so a cache registration per round
        # would just accumulate; checkpoint blocks are released by the
        # ContextCleaner once the superseded round's reference drops
        sym = sym.localCheckpoint(eager=True)
    finally:
        words.unpersist()

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def apply_merge(syms_series, left_series, right_series):
        import pandas as pd

        left = left_series.iloc[0]
        right = right_series.iloc[0]
        return pd.Series(
            [_merge_word(list(s), left, right) for s in syms_series]
        )

    merges: list = []
    for _ in range(num_merges):
        pairs = sym.select(
            F.explode(
                F.transform(
                    F.slice(F.col("syms"), 1, F.size("syms") - 1),
                    lambda s, i: F.struct(
                        s.alias("l"),
                        F.element_at(F.col("syms"), i + 2).alias("r"),
                    ),
                )
            ).alias("p"),
            "count",
        )
        top = (
            pairs.groupBy("p")
            .agg(F.sum("count").alias("freq"))
            .orderBy(F.desc("freq"), F.asc("p.l"), F.asc("p.r"))
            .limit(1)
            .collect()
        )
        if not top or top[0]["freq"] < min_freq:
            break
        left, right = top[0]["p"]["l"], top[0]["p"]["r"]
        merges.append((left, right, int(top[0]["freq"])))
        sym = sym.select(
            apply_merge(
                F.col("syms"), F.lit(left), F.lit(right)
            ).alias("syms"),
            "count",
        ).localCheckpoint(eager=True)
    return merges


def encode_bpe(
    df: DataFrame, merges: list, text_col: str = "text", out_col: str = "bpe_tokens"
) -> DataFrame:
    """Encode text with a learned merge table: per word, apply merges in
    rank order (the standard greedy BPE encoder).  The merge table
    broadcasts inside the Arrow-batched UDF closure; the plan stays
    narrow — no shuffle."""
    ranks = {(l, r): i for i, (l, r, *_) in enumerate(merges)}

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def encode(words_series):
        import pandas as pd

        def enc_word(w: str) -> list:
            syms = list(w)
            while len(syms) > 1:
                best = None
                for i in range(len(syms) - 1):
                    rk = ranks.get((syms[i], syms[i + 1]))
                    if rk is not None and (best is None or rk < best[0]):
                        best = (rk, syms[i], syms[i + 1])
                if best is None:
                    break
                syms = _merge_word(syms, best[1], best[2])
            return syms

        out = []
        for toks in words_series:
            enc: list = []
            for w in toks:
                enc.extend(enc_word(w))
            out.append(enc)
        return pd.Series(out)

    return df.withColumn(out_col, encode(tokens(F.lower(F.col(text_col)))))
