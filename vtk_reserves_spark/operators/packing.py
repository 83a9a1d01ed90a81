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
