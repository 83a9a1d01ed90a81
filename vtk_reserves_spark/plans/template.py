"""Compile a breakdown template into a logical plan.

Mirrors the row classification of reference ``bm_breakdown.py:62-104``:

- a row with one field, an empty op, or op ``breakdown`` is a **group key**;
- any other row is an **aggregate** ``(var, mode, weights...)``;
- ``var=alias`` renames the output column (``bm_breakdown.py:83-84``);
- the default aggregate column name is ``"<var> <mode>"`` except ``text``
  mode which keeps the bare var name (``bm_breakdown.py:96-101``);
- weight fields that are blank or not present in the input are silently
  dropped; comma-embedded weights are split (``bm_breakdown.py:194-203``).

The compiled plan is engine-agnostic; ``operators.breakdown`` lowers it to
Spark expressions and ``oracle.py`` (tests) lowers the same plan to ANSI
SQL for DuckDB cross-checking.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from vtk_reserves_spark.plans.commalist import parse_commalist, split_alias

#: modes implemented as single JVM-side aggregate expressions
PLAIN_MODES = frozenset(
    {
        "count",
        "sum",
        "mean",
        "min",
        "max",
        "var",
        "std",
        "sem",
        "q1",
        "q2",
        "q3",
        "major",
        "list",
        "text",
    }
)

QUARTILES = {"q1": 0.25, "q2": 0.50, "q3": 0.75}


@dataclass(frozen=True)
class KeySpec:
    var: str
    alias: str  # output column name

    @property
    def out(self) -> str:
        return self.alias or self.var


@dataclass(frozen=True)
class AggSpec:
    var: str
    mode: str
    weights: tuple[str, ...] = ()
    alias: str = ""
    text_value: str | None = None  # only for mode == 'text'

    @property
    def out(self) -> str:
        """Output column name — reference ``bm_breakdown.py:92-101``."""
        if self.alias:
            return self.alias
        if self.mode == "text":
            return self.var
        return f"{self.var} {self.mode}"

    @property
    def is_weighted_quantile(self) -> bool:
        return self.mode in QUARTILES and bool(self.weights)

    @property
    def is_major(self) -> bool:
        return self.mode == "major"

    def percentile(self) -> float | None:
        """Return the quantile in [0,1] for q1/q2/q3/p{N} modes."""
        if self.mode in QUARTILES:
            return QUARTILES[self.mode]
        if (
            len(self.mode) > 1
            and self.mode.startswith("p")
            and self.mode[1:].isnumeric()
        ):
            return float(self.mode[1:]) / 100.0
        return None


@dataclass
class BreakdownPlan:
    keys: list[KeySpec] = field(default_factory=list)
    aggs: list[AggSpec] = field(default_factory=list)

    @property
    def referenced_columns(self) -> list[str]:
        """All source columns the plan reads (for scan-level pruning,
        reference ``bm_breakdown.py:53-58``)."""
        seen: dict[str, None] = {}
        for k in self.keys:
            seen.setdefault(k.var)
        for a in self.aggs:
            if a.mode != "text":
                seen.setdefault(a.var)
            for w in a.weights:
                seen.setdefault(w)
        return list(seen)


def _parse_weights(fields: list[str], columns: set[str]) -> tuple[str, ...]:
    """Reference ``bm_breakdown.py:194-203``: skip blanks, split embedded
    commas, keep only weights that exist as input columns."""
    out: list[str] = []
    for w in fields:
        if not w:
            continue
        if "," in w:
            out.extend(p for p in w.split(",") if p in columns)
        elif w in columns:
            out.append(w)
    return tuple(out)


def compile_template(template, columns) -> BreakdownPlan:
    """Parse + classify a template against the input's column set.

    ``template`` may be a DSL string, a parsed 2-D list, or an existing
    list of rows; ``columns`` is the input DataFrame's column list.
    """
    rows = parse_commalist(template)
    cols = set(columns)
    plan = BreakdownPlan()

    for row in rows:
        if not row or not any(row):
            continue  # blank row, reference bm_breakdown.py:188-189
        var, alias = split_alias(row[0])
        if len(row) == 1 or row[1] == "breakdown" or len(row[1]) == 0:
            plan.keys.append(KeySpec(var=var, alias=alias))
            continue
        mode = row[1]
        if mode == "text":
            # raw text taken from the 3rd field if present, else the var
            # name itself (reference bm_breakdown.py:206-211)
            # a BLANK 3rd field (padded commalist grids emit them) falls
            # back to the var name like a missing field would
            text_value = row[2] if len(row) > 2 and row[2] else var
            plan.aggs.append(
                AggSpec(var=var, mode=mode, alias=alias, text_value=text_value)
            )
        else:
            plan.aggs.append(
                AggSpec(
                    var=var,
                    mode=mode,
                    weights=_parse_weights(row[2:], cols),
                    alias=alias,
                )
            )
    return plan


def vl_add_weight(vl: list[list[str]], w: str) -> list[list[str]]:
    """Append weight ``w`` to every mean/sum row that lacks it
    (reference ``vtk_reserves.py:92-98`` — auto ``mine`` weighting)."""
    for row in vl:
        if len(row) > 1 and row[1] in ("mean", "sum") and w not in row:
            row.append(w)
    return vl


def vl_add_region(vl: list[list[str]], region: str = "region") -> list[list[str]]:
    """Prepend a ``region`` group key unless one is already present
    (reference ``vtk_reserves.py:100-107``)."""
    for row in vl:
        if not row:
            continue
        if len(row) > 1:
            # multi-field rows keep the reference's prefix match
            # (vtk_reserves.py:100-107 checks startswith on these)
            if row[0].startswith(region):
                return vl
        else:
            # a bare single-field row (["region"]) IS a group key — the
            # original len(row) > 1 guard missed it and prepended a
            # duplicate key (two "region" output columns, ambiguous
            # sort).  But only an EXACT key match counts: a bare
            # ["region_code"] is a different key and still needs the
            # auto-inserted region column, so prefix matching here
            # would wrongly suppress it.
            if split_alias(row[0])[0] == region:
                return vl
    vl.insert(0, [region, "", ""])
    return vl
