"""GSLIB / GeoEAS tables — the geostatistics exchange format.

Every geostats toolchain (GSLIB itself, SGeMS, commercial mining
packages) reads/writes the GeoEAS layout: a title line, a variable
count (optionally followed by grid dims on the same line), one
variable name per line, then whitespace-separated numeric columns.
The reference repo's kriging/variogram lineage makes this the
exchange format its users actually hold sample data in.

Format quirks handled (the parts ad-hoc readers get wrong): the
count line may carry extra tokens (``3  50 50 1`` — nvar then grid
dims, which are preserved), values may be separated by any
whitespace run, the GSLIB no-data sentinel ``-999`` maps to NULL
(configurable, same posture as the reference's ``-99`` rule in
`sources/loaders.py`), and trailing blank lines are tolerated.

Scale posture: one GSLIB file is one task (binaryFile) — these are
sample/summary tables (MBs), not block models; for bulk data the
parquet path is primary.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

__all__ = ["parse_gslib", "write_gslib_text", "read_gslib"]


def parse_gslib(
    text: str, na_sentinel: float | None = -999.0
) -> tuple[str, list[str], list[list]]:
    """Parse GeoEAS text -> (title, var_names, rows).  Values equal
    to ``na_sentinel`` become None.  Raises ValueError on structural
    corruption (bad count line, ragged rows)."""
    lines = text.splitlines()
    if len(lines) < 2:
        raise ValueError("gslib: too short")
    title = lines[0].strip()
    head = lines[1].split()
    try:
        nvar = int(head[0])
    except (ValueError, IndexError):
        raise ValueError("gslib: bad variable-count line") from None
    if nvar <= 0 or len(lines) < 2 + nvar:
        raise ValueError("gslib: variable count exceeds header")
    names = [lines[2 + i].strip() for i in range(nvar)]
    rows = []
    for ln in lines[2 + nvar:]:
        if not ln.strip():
            continue
        toks = ln.split()
        if len(toks) != nvar:
            raise ValueError(
                f"gslib: row has {len(toks)} values, expected {nvar}"
            )
        row = []
        for tok in toks:
            v = float(tok)
            row.append(
                None
                if na_sentinel is not None and v == na_sentinel
                else v
            )
        rows.append(row)
    return title, names, rows


def write_gslib_text(
    title: str,
    names: list[str],
    rows: list[list],
    na_sentinel: float = -999.0,
) -> str:
    """Serialize to GeoEAS text (inverse of :func:`parse_gslib`);
    None values become the sentinel."""
    out = [title, str(len(names)), *names]
    for row in rows:
        out.append(" ".join(
            repr(na_sentinel if v is None else float(v)) for v in row
        ))
    return "\n".join(out) + "\n"


def read_gslib(
    spark: SparkSession, path_glob: str, na_sentinel: float | None = -999.0
) -> DataFrame:
    """Read GSLIB files into a DataFrame: one column per declared
    variable (double) plus ``_file`` and ``_title`` provenance
    columns.  Files in one glob must share a variable list (checked;
    drift raises)."""
    raw = (
        spark.read.format("binaryFile").load(path_glob)
        .select("path", "content")
    )
    first = raw.select("content").first()
    if first is None:
        raise ValueError("gslib: no files matched")
    _, names, _ = parse_gslib(
        bytes(first[0]).decode("utf-8", "replace"), na_sentinel
    )
    schema = T.StructType(
        [T.StructField("_file", T.StringType()),
         T.StructField("_title", T.StringType())]
        + [T.StructField(n, T.DoubleType()) for n in names]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            for path, content in zip(b["path"], b["content"]):
                fname = str(path).rsplit("/", 1)[-1]
                title, got_names, rows = parse_gslib(
                    bytes(content).decode("utf-8", "replace"), na_sentinel
                )
                if got_names != names:
                    raise ValueError(
                        f"gslib: {fname} variables {got_names} differ "
                        f"from {names}"
                    )
                yield pd.DataFrame(
                    [[fname, title] + r for r in rows],
                    columns=["_file", "_title"] + names,
                )

    return raw.mapInPandas(run, schema)
