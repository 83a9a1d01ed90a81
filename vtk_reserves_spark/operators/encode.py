"""Categorical string -> integer index encoding.

The reference factorizes every string column before handing data to VTK
(``pd_string_to_index``, ``vtk_flag_regions.py:21-26``;
``vtk_array_string_to_index``, ``pd_vtk.py:474-498``) with
``pd.factorize``.  Default pandas factorize codes values by order of
FIRST APPEARANCE — a row-order artifact that is not well-defined under a
parallel scan — so this engine implements the deterministic variant,
``pd.factorize(sort=True)`` parity: codes 0..n-1 in sorted value order,
NULL -> -1 (pandas' NaN sentinel).

Scale shape: one ``distinct`` per column builds the dictionary (string
categoricals are low-cardinality by nature), the ``dense_rank`` window
runs over that DICTIONARY — never over the data — and the mapping joins
back as a broadcast hash join, so the big side shuffles zero times.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def string_to_index(
    df: DataFrame,
    cols: list[str] | None = None,
    suffix: str = "",
) -> DataFrame:
    """Replace string columns with their sorted-dictionary integer code.

    ``cols=None`` encodes every string column (the reference's loop over
    object-dtype columns).  ``suffix`` writes ``<col><suffix>`` instead
    of replacing in place (handy when the labels are still needed)."""
    from pyspark.sql.types import StringType

    if cols is None:
        cols = [f.name for f in df.schema.fields if isinstance(f.dataType, StringType)]
    for c in cols:
        dic = (
            df.select(F.col(c).alias("__v"))
            .where(F.col("__v").isNotNull())
            .distinct()
            # window over the dictionary only (small by construction)
            .withColumn("__idx", F.dense_rank().over(Window.orderBy("__v")) - 1)
        )
        out_col = f"{c}{suffix}" if suffix else c
        df = (
            df.join(F.broadcast(dic), df[c] == dic["__v"], "left")
            .withColumn(out_col, F.coalesce(F.col("__idx"), F.lit(-1)))
            .drop("__v", "__idx")
        )
    return df
