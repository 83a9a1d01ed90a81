"""LAS well-log ingest — minimal pure-text parser for the public CWLS
LAS 1.2/2.0 ASCII format, no lasio dependency.

The reference loads LAS through lasio into a DataFrame
(``_gui.py:1333-1340``); we parse the ``~C``(urve) section for column
names and the ``~A``(SCII) section for data rows, honoring the NULL
value declared in ``~W`` (default -999.25).  Wrapped files (one value
per line) are handled by token-count framing.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession


def parse_las(text: str):
    """-> (curve_names, rows, null_value)."""
    curves: list[str] = []
    null_value = -999.25
    section = ""
    data_tokens: list[float] = []
    for line in text.splitlines():
        s = line.strip()
        if not s or s.startswith("#"):
            continue
        if s.startswith("~"):
            section = s[1].upper()
            continue
        if section == "W":
            m = re.match(r"NULL\s*\.\S*\s+([-+0-9.eE]+)", s)
            if m:
                null_value = float(m.group(1))
        elif section == "C":
            # "MNEM.UNIT  data : description"
            m = re.match(r"([^.\s]+)\s*\.", s)
            if m:
                curves.append(m.group(1))
        elif section == "A":
            data_tokens.extend(float(v) for v in s.split())
    n = len(curves)
    if n == 0:
        raise ValueError("no ~Curve section in LAS file")
    rows = [data_tokens[i : i + n] for i in range(0, len(data_tokens) - n + 1, n)]
    return curves, rows, null_value


def read_las(spark: SparkSession, path: str) -> DataFrame:
    """LAS -> DataFrame (one column per curve, declared NULL -> real
    NULL)."""
    import numpy as np
    import pandas as pd

    with open(path, "r", encoding="latin-1") as fh:
        curves, rows, null_value = parse_las(fh.read())
    pdf = pd.DataFrame(rows, columns=curves, dtype=float)
    pdf = pdf.mask(pdf == null_value, np.nan)
    # explicit schema: a header-only LAS (empty ~A section) gives an
    # empty frame createDataFrame cannot infer from; StructType rather
    # than a DDL string because curve mnemonics can hold odd characters
    from pyspark.sql.types import DoubleType, StructField, StructType

    df = spark.createDataFrame(
        pdf, schema=StructType([StructField(c, DoubleType()) for c in curves])
    )
    # Arrow ships NaN as float NaN, not NULL — normalize to real NULLs
    from pyspark.sql import functions as F

    return df.select(
        *[F.nanvl(F.col(c), F.lit(None).cast("double")).alias(c) for c in curves]
    )
