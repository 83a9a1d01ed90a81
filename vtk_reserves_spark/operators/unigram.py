"""Unigram-LM (SentencePiece-style) tokenizer training, Spark-native.

The second tokenizer-TRAINING family next to BPE (`operators/bpe.py`):
Kudo 2018 ("Subword Regularization") learns a piece vocabulary by EM
over a unigram language model.  This implements the deterministic
hard-EM (Viterbi-EM) variant with frequency pruning — the decisions
are argmaxes with explicit tie-breaks, so the learned vocabulary is
bit-reproducible, the property every oracle in this repo leans on.

Scale design mirrors BPE: everything after ONE corpus pass operates
on the (word, count) table (Heaps' law: distinct words ≪ corpus
tokens):

- corpus → (word, count): `bpe.word_counts` (one explode + groupBy);
- seed vocabulary: substring explode over the WORD table (pieces up
  to ``max_piece_len``) → one groupBy(piece) → top ``seed_size`` by
  (freq DESC, piece ASC) plus every single character (full coverage);
- each EM round: broadcast the piece log-probs (the vocabulary is
  KBs), Viterbi-segment each word in an Arrow-batched pandas UDF
  (lattice DP is per-word sequential — batch-level Python is the
  right tool, same as BPE's merge UDF), explode the chosen pieces →
  ONE groupBy(piece) → new counts; the M-step normalization is a
  vocabulary-sized driver reduce;
- pruning keeps the top ``vocab_size`` pieces by (count DESC, piece
  ASC), single characters always retained (char fallback, like
  SentencePiece's coverage guarantee).

Viterbi tie-break: scanning split points left to right, a candidate
replaces the incumbent only on a STRICTLY greater score — equal
scores keep the smaller split point, i.e. the longest LAST piece,
deterministically.  Single characters get +1 smoothing **inside the
E-step log-probs only** (a zero-count char must stay segmentable);
reported counts/probs are raw.

Correctness: pinned against `_learn_unigram_local` (same rules, pure
Python) by tests/test_unigram.py; q:unigram_degenerate hash-matches a
char-level closed form under the SQL oracle (the bpe_degenerate
pattern), and the general run is rows-only (iterative fixed point).

Reference parity note: the reference repo has no tokenizer surface;
this extends the LLM-pipeline tier (SURVEY §8, r6 banked item 6).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "seed_vocab", "learn_unigram", "encode_unigram",
    "viterbi_segment",
]


def viterbi_segment(word: str, logp: dict, max_piece_len: int) -> list:
    """Best segmentation of ``word`` under piece log-probs ``logp``
    (max sum of log-probs; ties -> smaller split point, i.e. the
    longest last piece).  Pieces
    absent from ``logp`` are not candidates; single chars are assumed
    present (char fallback)."""
    n = len(word)
    best = [-math.inf] * (n + 1)
    back = [0] * (n + 1)
    best[0] = 0.0
    for i in range(1, n + 1):
        for j in range(max(0, i - max_piece_len), i):
            piece = word[j:i]
            lp = logp.get(piece)
            if lp is None or best[j] == -math.inf:
                continue
            score = best[j] + lp
            if score > best[i]:  # strict: ties keep the smaller j
                best[i] = score
                back[i] = j
    if best[n] == -math.inf:
        raise ValueError(f"unigram: word {word!r} not segmentable")
    out = []
    i = n
    while i > 0:
        j = back[i]
        out.append(word[j:i])
        i = j
    return out[::-1]


def seed_vocab(
    words: DataFrame, max_piece_len: int = 8, seed_size: int = 2000
) -> DataFrame:
    """(word, count) -> seed (piece, freq): every substring of every
    word up to ``max_piece_len``, frequency-weighted; the top
    ``seed_size`` multi-char pieces by (freq DESC, piece ASC) union
    ALL single characters."""
    import pandas as pd

    def substrings(batches):
        for b in batches:
            pieces: dict = {}
            for w, c in zip(b["word"], b["count"].astype("int64")):
                n = len(w)
                for i in range(n):
                    for ln in range(1, min(max_piece_len, n - i) + 1):
                        p = w[i : i + ln]
                        pieces[p] = pieces.get(p, 0) + int(c)
            yield pd.DataFrame(
                {"piece": list(pieces), "freq": list(pieces.values())}
            )

    agg = (
        words.mapInPandas(substrings, "piece string, freq long")
        .groupBy("piece")
        .agg(F.sum("freq").alias("freq"))
    )
    chars = agg.filter(F.length("piece") == 1)
    multi = (
        agg.filter(F.length("piece") > 1)
        .orderBy(F.col("freq").desc(), F.col("piece").asc())
        .limit(int(seed_size))
    )
    return chars.unionByName(multi)


def _em_round(
    words: DataFrame, logp: dict, max_piece_len: int
) -> DataFrame:
    """One hard-EM E-step: Viterbi-segment every word, emit
    (piece, count) weighted by word frequency."""
    import pandas as pd

    spark = words.sparkSession
    blp = spark.sparkContext.broadcast(logp)

    def segment(batches):
        lp = blp.value
        for b in batches:
            counts: dict = {}
            for w, c in zip(b["word"], b["count"].astype("int64")):
                for p in viterbi_segment(w, lp, max_piece_len):
                    counts[p] = counts.get(p, 0) + int(c)
            yield pd.DataFrame(
                {"piece": list(counts), "count": list(counts.values())}
            )

    return (
        words.mapInPandas(segment, "piece string, count long")
        .groupBy("piece")
        .agg(F.sum("count").alias("count"))
    )


def _smoothed_logp(counts: dict) -> dict:
    """E-step log-probs: raw counts, +1 for single chars (a
    zero-count char must remain segmentable)."""
    eff = {
        p: c + (1 if len(p) == 1 else 0) for p, c in counts.items()
    }
    eff = {p: c for p, c in eff.items() if c > 0}
    tot = sum(eff.values())
    return {p: math.log(c / tot) for p, c in eff.items()}


def learn_unigram(
    words: DataFrame,
    vocab_size: int = 200,
    em_iters: int = 2,
    max_piece_len: int = 8,
    seed_size: int = 2000,
) -> DataFrame:
    """(word, count) -> learned unigram vocabulary
    ``(piece, count, prob)``: seed by substring frequency, run
    ``em_iters`` Viterbi-EM rounds over the distributed word table,
    prune to ``vocab_size`` by (count DESC, piece ASC) with single
    chars always kept, and report raw final-round counts with probs
    normalized over the kept set."""
    seed = seed_vocab(words, max_piece_len, seed_size)
    vocab = {
        r["piece"]: int(r["freq"]) for r in seed.collect()
    }  # vocabulary-sized (KBs), the same driver reduce BPE does
    counts = vocab
    for _ in range(max(1, int(em_iters))):
        logp = _smoothed_logp(counts)
        new = _em_round(words, logp, max_piece_len)
        counts = {
            r["piece"]: int(r["count"]) for r in new.collect()
        }
        # char fallback survives every round
        for p in vocab:
            if len(p) == 1 and p not in counts:
                counts[p] = 0
    ranked = sorted(
        counts.items(), key=lambda kv: (-kv[1], kv[0])
    )
    n_chars = sum(1 for p, _ in ranked if len(p) == 1)
    kept_multi = [(p, c) for p, c in ranked if len(p) > 1][
        : max(0, int(vocab_size) - n_chars)
    ]
    chars = [(p, c) for p, c in ranked if len(p) == 1]
    final = sorted(
        chars + kept_multi, key=lambda kv: (-kv[1], kv[0])
    )
    tot = sum(c for _, c in final) or 1
    spark = words.sparkSession
    return spark.createDataFrame(
        [(p, c, c / tot) for p, c in final],
        T.StructType([
            T.StructField("piece", T.StringType()),
            T.StructField("count", T.LongType()),
            T.StructField("prob", T.DoubleType()),
        ]),
    )


def encode_unigram(
    df: DataFrame,
    vocab: dict,
    text_col: str = "text",
    max_piece_len: int = 8,
) -> DataFrame:
    """Segment ``text_col`` words with a TRAINED vocabulary
    ``{piece: prob}``: Viterbi per word under log-probs, one
    Arrow-batched pass, output (original columns + ``pieces``
    array<string>)."""
    import pandas as pd

    from vtk_reserves_spark.functions.text import tokens  # noqa: F401

    logp = {p: math.log(v) for p, v in vocab.items() if v > 0}
    spark = df.sparkSession
    blp = spark.sparkContext.broadcast(logp)
    cols = df.columns

    def run(batches):
        lp = blp.value
        for b in batches:
            pieces = []
            for t in b[text_col]:
                toks = str(t).lower().split()
                out = []
                for w in toks:
                    out.extend(viterbi_segment(w, lp, max_piece_len))
                pieces.append(out)
            b = b.copy()
            b["pieces"] = pieces
            yield b

    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in df.schema.fields
    ) + ", pieces array<string>"
    return df.mapInPandas(run, schema)


def _learn_unigram_local(
    counts: dict,
    vocab_size: int = 200,
    em_iters: int = 2,
    max_piece_len: int = 8,
    seed_size: int = 2000,
) -> list:
    """Pure-Python reference over a (word -> count) dict — the SAME
    seeding, E-step, smoothing, and pruning rules as the distributed
    learner (tests/test_unigram.py pins them to each other).
    Returns [(piece, count, prob)] in (count DESC, piece ASC)."""
    pieces: dict = {}
    for w, c in counts.items():
        n = len(w)
        for i in range(n):
            for ln in range(1, min(max_piece_len, n - i) + 1):
                p = w[i : i + ln]
                pieces[p] = pieces.get(p, 0) + c
    chars = {p: f for p, f in pieces.items() if len(p) == 1}
    multi = sorted(
        ((p, f) for p, f in pieces.items() if len(p) > 1),
        key=lambda kv: (-kv[1], kv[0]),
    )[: int(seed_size)]
    vocab = dict(chars)
    vocab.update(dict(multi))
    cur = vocab
    for _ in range(max(1, int(em_iters))):
        logp = _smoothed_logp(cur)
        new: dict = {}
        for w, c in counts.items():
            for p in viterbi_segment(w, logp, max_piece_len):
                new[p] = new.get(p, 0) + c
        for p in vocab:
            if len(p) == 1 and p not in new:
                new[p] = 0
        cur = new
    ranked = sorted(cur.items(), key=lambda kv: (-kv[1], kv[0]))
    n_chars = sum(1 for p, _ in ranked if len(p) == 1)
    kept_multi = [(p, c) for p, c in ranked if len(p) > 1][
        : max(0, int(vocab_size) - n_chars)
    ]
    chars_kept = [(p, c) for p, c in ranked if len(p) == 1]
    final = sorted(chars_kept + kept_multi, key=lambda kv: (-kv[1], kv[0]))
    tot = sum(c for _, c in final) or 1
    return [(p, c, c / tot) for p, c in final]
