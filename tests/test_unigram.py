"""Unigram-LM tokenizer training: Viterbi closed forms and
tie-breaks, seed-vocabulary counting, the distributed learner pinned
to the pure-Python reference, char fallback, encoding, and the
degenerate char-level closed form."""
import math

import pytest

from vtk_reserves_spark.operators.bpe import word_counts
from vtk_reserves_spark.operators.unigram import (
    _learn_unigram_local,
    encode_unigram,
    learn_unigram,
    seed_vocab,
    viterbi_segment,
)


def test_viterbi_prefers_high_probability():
    logp = {"a": math.log(0.1), "b": math.log(0.1),
            "ab": math.log(0.8)}
    assert viterbi_segment("ab", logp, 8) == ["ab"]
    assert viterbi_segment("aab", logp, 8) == ["a", "ab"]


def test_viterbi_tie_prefers_longer_last_piece():
    # p(ab)*p(c) == p(a)*p(bc): the strict-improvement rule scans
    # split points j ascending, so equal scores keep the SMALLER j —
    # the segmentation whose last piece is longer
    logp = {"a": math.log(0.2), "c": math.log(0.2),
            "ab": math.log(0.3), "bc": math.log(0.3),
            "b": math.log(0.0001)}
    assert viterbi_segment("abc", logp, 8) == ["a", "bc"]


def test_viterbi_unsegmentable_raises():
    with pytest.raises(ValueError, match="segmentable"):
        viterbi_segment("xy", {"x": math.log(0.5)}, 8)


def test_viterbi_respects_max_piece_len():
    logp = {"a": math.log(0.01), "aaaa": math.log(0.9)}
    assert viterbi_segment("aaaa", logp, 3) == ["a"] * 4
    assert viterbi_segment("aaaa", logp, 4) == ["aaaa"]


def test_seed_vocab_counts(spark):
    words = spark.createDataFrame(
        [("ab", 3), ("b", 2)], "word string, count long"
    )
    seed = {r["piece"]: r["freq"]
            for r in seed_vocab(words, max_piece_len=2).collect()}
    # substrings of "ab"*3: a,b,ab each 3; plus "b"*2
    assert seed == {"a": 3, "b": 5, "ab": 3}


def test_seed_vocab_truncates_multi_keeps_chars(spark):
    words = spark.createDataFrame(
        [("abc", 5), ("abd", 1)], "word string, count long"
    )
    seed = seed_vocab(words, max_piece_len=3, seed_size=2).collect()
    pieces = {r["piece"] for r in seed}
    assert {"a", "b", "c", "d"} <= pieces  # chars always kept
    multi = [p for p in pieces if len(p) > 1]
    assert sorted(multi) == ["ab", "abc"]  # top-2 by (freq, piece)


def test_distributed_matches_local_reference(spark):
    corpus = [
        ("the table scans fast",),
        ("fast scans beat slow scans",),
        ("the fast table",),
        ("slow table scans the fast table",),
    ]
    docs = spark.createDataFrame(corpus, "text string")
    wc = word_counts(docs)
    got = [
        (r["piece"], r["count"], round(r["prob"], 12))
        for r in learn_unigram(
            wc, vocab_size=12, em_iters=2, max_piece_len=4,
            seed_size=20,
        ).collect()
    ]
    counts = {r["word"]: r["count"] for r in wc.collect()}
    want = [
        (p, c, round(pr, 12))
        for p, c, pr in _learn_unigram_local(
            counts, vocab_size=12, em_iters=2, max_piece_len=4,
            seed_size=20,
        )
    ]
    assert got == want
    # chars always survive pruning
    chars = {p for p, _, _ in got if len(p) == 1}
    assert chars == set("".join(counts)) - set()


def test_char_fallback_zero_count_survives(spark):
    # 'q' appears only inside a word the EM segments as one piece
    # (log p(qqqq) beats every split under the seed counts), but the
    # char stays in the vocabulary with count 0 via the fallback
    words = spark.createDataFrame(
        [("qqqq", 50)], "word string, count long"
    )
    out = {r["piece"]: r["count"]
           for r in learn_unigram(words, vocab_size=5, em_iters=2,
                                  max_piece_len=4).collect()}
    assert out["qqqq"] == 50
    assert out["q"] == 0


def test_degenerate_char_level_closed_form(spark):
    """max_piece_len=1 collapses the learner to char frequencies —
    the q:unigram_degenerate closed form."""
    docs = spark.createDataFrame(
        [("aab ba",), ("ab",)], "text string"
    )
    out = {r["piece"]: (r["count"], r["prob"])
           for r in learn_unigram(word_counts(docs), vocab_size=10,
                                  em_iters=1, max_piece_len=1,
                                  ).collect()}
    # chars: a x4, b x3 (whitespace never enters word_counts)
    assert out == {"a": (4, 4 / 7), "b": (3, 3 / 7)}


def test_encode_unigram(spark):
    vocab = {"scan": 0.4, "s": 0.05, "fast": 0.4, "a": 0.05,
             "c": 0.05, "n": 0.05, "t": 0.05, "f": 0.05}
    df = spark.createDataFrame([(1, "fast scans")],
                               "doc_id long, text string")
    out = encode_unigram(df, vocab).collect()[0]
    assert out["pieces"] == ["fast", "scan", "s"]
