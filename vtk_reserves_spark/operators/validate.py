"""Declarative data-quality checks (Deequ-style constraint
verification, Schelter et al. 2018 — the pipeline guard a 100 TB ingest
runs before promoting a batch).

Rules are plain tuples; row-level rules compile into ONE aggregation
pass (each rule is a ``sum(when(violated, 1))`` — map-side combined,
scan-bound), and uniqueness rules each add one keyed groupBy.  The
report is one tiny DataFrame ``(rule, metric, passed)`` — safe to
collect, alert on, or append to a history table.

Rule kinds:

- ``("not_null", col)`` — metric = NULL count;
- ``("in_range", col, lo, hi)`` — metric = count outside [lo, hi]
  (NULLs don't count; pair with not_null to forbid them);
- ``("matches", col, regex)`` — metric = non-NULL values NOT fully
  matching ``regex`` (Java regex semantics, anchored);
- ``("accepted_values", col, [v, ...])`` — metric = non-NULL values
  outside the list;
- ``("unique", [col, ...])`` — metric = rows carrying a duplicated key
  (total rows in groups of size > 1);
- ``("row_count_min", n)`` — metric = total rows, passes when >= n.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _rule_name(rule: tuple) -> str:
    kind = rule[0]
    if kind == "unique":
        return f"unique({','.join(rule[1])})"
    if kind == "row_count_min":
        return f"row_count_min({rule[1]})"
    if kind == "in_range":
        return f"in_range({rule[1]},{rule[2]!r},{rule[3]!r})"
    if kind == "matches":
        return f"matches({rule[1]})"
    if kind == "accepted_values":
        return f"accepted_values({rule[1]})"
    return f"{kind}({rule[1]})"


def check(df: DataFrame, rules: list) -> DataFrame:
    """Verify ``rules`` against ``df``; returns
    ``(rule, metric, passed)`` ordered by rule name.

    Two rules that render to the same display name (e.g. two
    ``matches`` patterns on one column) are disambiguated with a
    ``#2``/``#3`` suffix on the later ones; internally every rule gets
    a positional alias, so no rule combination can collide in the
    aggregation."""
    names = [_rule_name(r) for r in rules]
    seen: dict[str, int] = {}
    for i, n in enumerate(names):
        seen[n] = seen.get(n, 0) + 1
        if seen[n] > 1:
            names[i] = f"{n}#{seen[n]}"
    agg_exprs = []
    agg_meta = []  # (internal alias, display name, mode tuple)
    unique_rules = []
    for idx, rule in enumerate(rules):
        kind = rule[0]
        name = names[idx]
        alias = f"__r{idx}"
        if kind == "not_null":
            viol = F.col(rule[1]).isNull()
        elif kind == "in_range":
            c = F.col(rule[1])
            viol = c.isNotNull() & ((c < rule[2]) | (c > rule[3]))
        elif kind == "matches":
            c = F.col(rule[1])
            viol = c.isNotNull() & ~c.rlike(f"^(?:{rule[2]})$")
        elif kind == "accepted_values":
            c = F.col(rule[1])
            viol = c.isNotNull() & ~c.isin(list(rule[2]))
        elif kind == "row_count_min":
            agg_exprs.append(F.count(F.lit(1)).alias(alias))
            agg_meta.append((alias, name, ("min", int(rule[1]))))
            continue
        elif kind == "unique":
            unique_rules.append((name, list(rule[1])))
            continue
        else:
            raise ValueError(f"unknown rule kind {kind!r}")
        agg_exprs.append(
            F.sum(F.when(viol, 1).otherwise(0)).cast("long").alias(alias)
        )
        agg_meta.append((alias, name, ("zero", None)))

    spark = df.sparkSession
    parts = []
    if agg_exprs:
        row = df.agg(*agg_exprs)
        selects = []
        for alias, name, (mode, arg) in agg_meta:
            metric = F.coalesce(F.col(alias), F.lit(0)).cast("long")
            passed = metric >= arg if mode == "min" else metric == 0
            selects.append(
                F.struct(
                    F.lit(name).alias("rule"),
                    metric.alias("metric"),
                    passed.alias("passed"),
                ).alias(alias)
            )
        wide = row.select(F.array(*selects).alias("a"))
        parts.append(
            wide.select(F.explode("a").alias("s")).select(
                "s.rule", "s.metric", "s.passed"
            )
        )
    for name, cols in unique_rules:
        dup_rows = (
            df.groupBy(*cols)
            .agg(F.count(F.lit(1)).alias("_n"))
            .where(F.col("_n") > 1)
            .agg(F.coalesce(F.sum("_n"), F.lit(0)).cast("long").alias("metric"))
        )
        parts.append(
            dup_rows.select(
                F.lit(name).alias("rule"),
                "metric",
                (F.col("metric") == 0).alias("passed"),
            )
        )
    if not parts:
        return spark.createDataFrame([], "rule string, metric long, passed boolean")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("rule")


def profile(df: DataFrame, columns: list | None = None, exact_distinct: bool = True) -> DataFrame:
    """Column profiler: one row per column with ``(column, dtype, n,
    n_null, n_distinct, min_str, max_str)`` — the quick-look summary a
    pipeline logs next to its :func:`check` report.

    Everything computes in ONE aggregation pass.  ``exact_distinct``
    uses ``count(distinct col)`` per column (Catalyst lowers multiple
    distinct aggregates via expand — fine for tens of columns, and the
    oracle-checkable mode); pass ``False`` for
    ``approx_count_distinct`` (HLL, no expand) on very wide or very
    large tables.  min/max stringify so heterogeneous column types fit
    one report schema.

    Non-orderable / non-comparable column types (maps, and structs or
    arrays containing maps) take NULL for distinct/min/max instead of
    failing the whole profile at analysis time — the null count still
    computes for every column."""
    from pyspark.sql import types as T

    def _orderable(dt) -> bool:
        if isinstance(dt, T.MapType):
            return False
        if isinstance(dt, T.ArrayType):
            return _orderable(dt.elementType)
        if isinstance(dt, T.StructType):
            return all(_orderable(f.dataType) for f in dt.fields)
        return True

    cols = columns or df.columns
    by_name = {f.name: f.dataType for f in df.schema.fields}
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        col = F.col(f"`{c}`")
        aggs.append(F.sum(F.when(col.isNull(), 1).otherwise(0)).cast("long").alias(f"_null_{c}"))
        if _orderable(by_name[c]):
            aggs.append(
                (F.count_distinct(col) if exact_distinct else F.approx_count_distinct(col))
                .cast("long").alias(f"_dist_{c}")
            )
            aggs.append(F.min(col).cast("string").alias(f"_min_{c}"))
            aggs.append(F.max(col).cast("string").alias(f"_max_{c}"))
        else:
            aggs.append(F.first(F.lit(None).cast("long")).alias(f"_dist_{c}"))
            aggs.append(F.first(F.lit(None).cast("string")).alias(f"_min_{c}"))
            aggs.append(F.first(F.lit(None).cast("string")).alias(f"_max_{c}"))
    row = df.agg(*aggs)
    dtypes = dict(df.dtypes)
    structs = [
        F.struct(
            F.lit(c).alias("column"),
            F.lit(dtypes[c]).alias("dtype"),
            F.col("_n").cast("long").alias("n"),
            F.col(f"`_null_{c}`").alias("n_null"),
            F.col(f"`_dist_{c}`").alias("n_distinct"),
            F.col(f"`_min_{c}`").alias("min_str"),
            F.col(f"`_max_{c}`").alias("max_str"),
        ).alias(c)
        for c in cols
    ]
    return (
        row.select(F.explode(F.array(*structs)).alias("s"))
        .select("s.column", "s.dtype", "s.n", "s.n_null", "s.n_distinct",
                "s.min_str", "s.max_str")
        .orderBy("column")
    )
