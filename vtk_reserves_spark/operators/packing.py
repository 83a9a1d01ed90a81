"""Sequence packing for training-data assembly.

North-star addition (SURVEY.md §2.8): GPT-style packing concatenates
documents into a token stream and cuts fixed-size windows; the training
loader then reads window ``b`` as tokens ``[b*W, (b+1)*W)``.  The
assignment problem — which documents land in which window — is a
running sum, so it lowers to a keyed window cumsum:

- documents are split into ``shards`` deterministic streams (md5 of the
  id, so membership survives repartitioning — same device as
  `operators/sampling.py`);
- within a shard, documents are ordered by id and each gets its start
  offset ``cumsum(tokens) - tokens``;
- window ids follow by integer division; a document spans
  ``bin_first..bin_last`` (crossing docs are split by the loader, the
  standard concat-and-chunk semantics).

Scale shape: ONE hash partitioning by shard (the only shuffle), sort
within partitions, pure expressions after — no global window, state per
shard is a running sum.  Shard count trades stream length vs
parallelism; at 100 TB use O(10k) shards so each stream is a few GB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_offsets(
    df: DataFrame,
    id_col: str,
    token_col: str,
    window: int,
    shards: int = 8,
    out_prefix: str = "",
) -> DataFrame:
    """Assign each document its span in the packed token stream.

    Returns the input's ``id_col`` plus ``shard``, ``start_tok`` (offset
    of the document's first token within its shard stream), ``bin_first``
    and ``bin_last`` (the packing windows the document touches; equal
    when the document fits inside one window).  Empty documents occupy
    zero tokens: their span is empty and both bins are the window their
    offset falls in."""
    from vtk_reserves_spark.operators.sampling import md5_bucket

    p = out_prefix
    # seedless pmod bucket — the one md5-prefix device shared with
    # sampling/dedup (operators/sampling.md5_bucket), mirrored verbatim
    # in the SQL oracle
    shard = md5_bucket(F.col(id_col), F.lit(shards), signed_mod=False)
    w = (
        Window.partitionBy("shard")
        .orderBy(F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    toks = F.col(token_col).cast("long")
    out = (
        df.select(F.col(id_col), toks.alias("_n"))
        .withColumn("shard", shard.cast("int"))
        .withColumn("_end", F.sum("_n").over(w))
        .select(
            id_col,
            "shard",
            (F.col("_end") - F.col("_n")).alias(f"{p}start_tok"),
            (
                (F.col("_end") - F.col("_n")) / window
            ).cast("long").alias(f"{p}bin_first"),
            F.greatest(
                ((F.col("_end") - F.col("_n")) / window).cast("long"),
                ((F.col("_end") - 1) / window).cast("long"),
            ).alias(f"{p}bin_last"),
        )
    )
    return out


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_tokens: int,
    overlap: int = 0,
    normalize: bool = True,
) -> DataFrame:
    """Split each document into fixed-size token windows with optional
    overlap — the chunking step ahead of embedding / retrieval indexing
    or context-window-bounded training, where :func:`pack_offsets`
    handles the opposite (concatenating) regime.

    Chunk ``c`` covers tokens ``[c·(chunk_tokens−overlap),
    c·(chunk_tokens−overlap) + chunk_tokens)``; the last chunk is
    short rather than padded, and a document shorter than one stride
    yields exactly one (possibly short) chunk.  A trailing window
    whose tokens would ALL fall inside the previous chunk's overlap
    region (start ≥ n − overlap) is dropped — it would be a strict
    subset of its predecessor, duplicating embedding/retrieval work.
    Empty documents yield no rows.  With ``normalize`` the text is lowercased/stripped
    first (the corpus-pipeline convention shared with fingerprinting);
    pass ``False`` to chunk raw whitespace tokens.

    Pure Catalyst end to end: one tokenize + bounded ``sequence``
    explode (fan-out = ceil(n_tokens / stride), linear in the token
    stream) + ``slice``/``array_join`` — narrow, no shuffle, no Python.
    Returns ``(id, chunk_id, start_tok, n_tokens, chunk_text)``.
    """
    from vtk_reserves_spark.functions.text import normalize_text, tokens

    if chunk_tokens <= 0:
        raise ValueError("chunk_tokens must be positive")
    if not (0 <= overlap < chunk_tokens):
        raise ValueError("overlap must be in [0, chunk_tokens)")
    stride = chunk_tokens - overlap
    src = F.col(text_col)
    toks = tokens(normalize_text(src) if normalize else src)
    base = df.select(
        F.col(id_col).alias("_id"), toks.alias("_t")
    ).withColumn("_n", F.size("_t")).where(F.col("_n") > 0)
    # chunk starts 0, stride, 2*stride, ... < n  (sequence is inclusive,
    # so the upper bound is n-1; guard keeps ANSI mode happy).  A start
    # at or past n-overlap would produce a chunk fully contained in the
    # last KEPT chunk; the drop condition s >= n-overlap is monotone in
    # s, so the dropped starts are always a suffix (a single start when
    # overlap <= chunk_tokens/2, possibly several when overlap is
    # larger) and chunk_id stays contiguous either way
    starts = F.sequence(F.lit(0), F.col("_n") - 1, F.lit(stride))
    out = (
        base.select("_id", "_t", "_n", F.posexplode(starts).alias("chunk_id", "_s"))
        .where(
            (F.col("_s") == 0) | (F.col("_s") < F.col("_n") - overlap)
        )
        .select(
            F.col("_id").alias(id_col),
            "chunk_id",
            F.col("_s").alias("start_tok"),
            F.least(F.lit(chunk_tokens), F.col("_n") - F.col("_s")).alias(
                "n_tokens"
            ),
            F.array_join(
                F.slice(F.col("_t"), F.col("_s") + 1, F.lit(chunk_tokens)), " "
            ).alias("chunk_text"),
        )
    )
    return out
