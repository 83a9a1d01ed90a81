"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship reserves-style breakdown;
``queries()`` exposes one callable per implemented operator from
SURVEY.md §2; ``oracle_sql()`` gives the DuckDB-equivalent ANSI SQL for
each (same column names — the driver hash-compares values).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vtk_reserves_spark.operators.breakdown import breakdown
from vtk_reserves_spark.operators.reserves import reserves_report
from vtk_reserves_spark.operators.spatial import (
    PlaneSurface,
    flag_regions,
    flag_regions_2d,
    mine_fraction,
)
from vtk_reserves_spark.sources.grid import GridSchema, grid_df, heatmap2d, nearest_cell
from vtk_reserves_spark.sources.mesh import TriMesh

SF0001 = "/root/testdata/sf0.001"


def _read(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------------
# breakdown family (SURVEY §2.4) — the core aggregation engine
# ---------------------------------------------------------------------------

def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: TPC-H-Q1-style breakdown with plain + weighted modes."""
    li = _read(spark, sf_dir, "lineitem")
    return breakdown(
        li,
        "l_returnflag;l_linestatus;"
        "l_quantity=sum_qty,sum;"
        "l_extendedprice=sum_base_price,sum;"
        "l_quantity=avg_qty,mean;"
        "l_extendedprice=avg_price,mean;"
        "l_discount=avg_disc,mean;"
        "l_quantity=count_order,count;"
        "l_extendedprice=wavg_price_by_qty,mean,l_quantity",
    )


def q_breakdown_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _read(spark, sf_dir, "lineitem")
    return breakdown(
        li,
        "l_returnflag;"
        "l_quantity=min_qty,min;l_quantity=max_qty,max;"
        "l_quantity=var_qty,var;l_quantity=std_qty,std;l_quantity=sem_qty,sem;"
        "l_extendedprice=wsum_price,sum,l_quantity",
    )


def q_breakdown_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _read(spark, sf_dir, "lineitem")
    return breakdown(
        li,
        "l_returnflag;"
        "l_quantity=q1_qty,q1;l_quantity=med_qty,q2;l_quantity=q3_qty,q3;"
        "l_extendedprice=p10_price,p10;l_extendedprice=p90_price,p90",
    )


def q_breakdown_weighted_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _read(spark, sf_dir, "lineitem")
    return breakdown(
        li,
        "l_returnflag;l_linestatus;"
        "l_extendedprice=wq2_price,q2,l_quantity",
    )


def q_breakdown_major_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _read(spark, sf_dir, "lineitem")
    return breakdown(
        li,
        "l_returnflag;"
        "l_linestatus=major_status,major;"
        "l_linestatus=status_list,list;"
        "src=src,text,report",
    )


def q_null_sentinel_mask(spark: SparkSession, sf_dir: str) -> DataFrame:
    """-99 sentinel normalization (reference _gui.py:269-270): derive a
    column containing -99s, mask to NULL, aggregate — NULL groups are
    re-filled with the sentinel (bm_breakdown.py:105-108)."""
    li = _read(spark, sf_dir, "lineitem").withColumn(
        "qty99",
        F.when(F.col("l_linenumber") % 7 == 0, F.lit(-99.0)).otherwise(
            F.col("l_quantity")
        ),
    )
    from vtk_reserves_spark.sources.loaders import mask_null_sentinel

    li = mask_null_sentinel(li, columns=["qty99"])
    return breakdown(li, "l_returnflag;qty99=sum_qty,sum;qty99=cnt_qty,count")


# ---------------------------------------------------------------------------
# grid layer (SURVEY §2.6, §1.2) — virtual voxel grid as a DataFrame
# ---------------------------------------------------------------------------

_GS = GridSchema(origin=(0.0, 0.0, 0.0), spacing=(10.0, 10.0, 10.0), dims=(30, 20, 20))


def q_grid_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generated 30x20x20 grid (the reference sample's shape) — cell ids,
    ijk, centroids, volume, all from spark.range arithmetic."""
    return grid_df(spark, _GS)


def q_grid_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """heatmap2d (pd_vtk.py:876-895): mean along the z axis of a derived
    cell variable -> one value per (i,j) column of the grid."""
    g = grid_df(spark, _GS).withColumn(
        "grade", (F.col("i") * 7 + F.col("j") * 3 + F.col("k")) % 100
    )
    return heatmap2d(g, "grade", axis=2, op="mean").select(
        "i", "j", F.col("grade").alias("grade")
    )


# ---------------------------------------------------------------------------
# spatial operators (SURVEY §2.5) — reserves fixtures with analytic oracles
# ---------------------------------------------------------------------------

#: overlapping box region solids; later regions overwrite earlier
#: (vtk_flag_regions.py:63-73); some cells fall in no region
_BOXES = [
    ("region1", ((50.0, 30.0, 0.0), (150.0, 120.0, 200.0))),
    ("region2", ((100.0, 60.0, 20.0), (250.0, 180.0, 160.0))),
    ("region3", ((0.0, 150.0, 0.0), (300.0, 200.0, 100.0))),
]
_INC = PlaneSurface(0.1, 0.05, 120.0)  # mine-up topography
_EXC = PlaneSurface(0.0, 0.0, 30.0)  # mine-down floor


def _fixture_grid(spark: SparkSession) -> DataFrame:
    """std_voxel-like block model (FIXTURES.md §1): the reference sample's
    30x20x20 grid with deterministic grade/density/lito cell arrays."""
    return (
        grid_df(spark, _GS)
        .withColumn(
            "grade",
            ((F.col("i") * 7 + F.col("j") * 3 + F.col("k") * 11) % 100).cast("double"),
        )
        .withColumn(
            "density",
            (75 + (F.col("i") + 2 * F.col("j") + 3 * F.col("k")) % 16).cast("double"),
        )
        .withColumn(
            "lito",
            F.element_at(
                F.array(F.lit("high"), F.lit("medium"), F.lit("low")),
                ((F.col("i") + F.col("j") + F.col("k")) % 3 + 1).cast("int"),
            ),
        )
        .withColumn("mass", F.col("volume") * F.col("density"))
    )


#: shared DuckDB CTE mirroring _fixture_grid + mine + region closed forms
_FIXTURE_SQL = """
    WITH g AS (
      SELECT CAST(r.range % 30 AS INT) AS i,
             CAST((r.range // 30) % 20 AS INT) AS j,
             CAST(r.range // 600 AS INT) AS k,
             r.range AS cell,
             (CAST(r.range % 30 AS INT) + 0.5) * 10.0 AS x,
             (CAST((r.range // 30) % 20 AS INT) + 0.5) * 10.0 AS y,
             (CAST(r.range // 600 AS INT) + 0.5) * 10.0 AS z,
             1000.0 AS volume
      FROM range(12000) r
    ), v AS (
      SELECT *,
             CAST((i*7 + j*3 + k*11) % 100 AS DOUBLE) AS grade,
             CAST(75 + (i + 2*j + 3*k) % 16 AS DOUBLE) AS density,
             ['high','medium','low'][(i+j+k) % 3 + 1] AS lito,
             1000.0 * CAST(75 + (i + 2*j + 3*k) % 16 AS DOUBLE) AS mass
      FROM g
    ), f AS (
      SELECT *,
             LEAST(GREATEST(((0.1*x + 0.05*y + 120.0) - z + 5.0)/10.0, 0.0), 1.0)
               * (1.0 - LEAST(GREATEST((30.0 - z + 5.0)/10.0, 0.0), 1.0)) AS mine,
             CASE
               WHEN x BETWEEN 0 AND 300 AND y BETWEEN 150 AND 200
                    AND z BETWEEN 0 AND 100 THEN 'region3'
               WHEN x BETWEEN 100 AND 250 AND y BETWEEN 60 AND 180
                    AND z BETWEEN 20 AND 160 THEN 'region2'
               WHEN x BETWEEN 50 AND 150 AND y BETWEEN 30 AND 120
                    AND z BETWEEN 0 AND 200 THEN 'region1'
               ELSE '' END AS region
      FROM v
    )
"""


def q_flag_regions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-solid flags via the real ray-cast pandas-UDF against
    triangulated box meshes; the oracle is the equivalent BETWEEN chain."""
    meshes = [TriMesh.box(b, name=n) for n, b in _BOXES]
    return flag_regions(grid_df(spark, _GS), meshes).select("cell", "region")


def q_flag_regions_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    mesh = TriMesh.box(((50.0, 30.0, 0.0), (150.0, 120.0, 50.0)), name="r1")
    return flag_regions_2d(grid_df(spark, _GS), [mesh]).select("cell", "region")


def q_mine_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    return mine_fraction(
        grid_df(spark, _GS), include=[_INC], exclude=[_EXC]
    ).select("cell", "mine")


def q_nearest_cell(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverse-affine nearest-cell assignment (pd_vtk.py:671-702): snap
    synthetic points derived from orders keys onto the fixture grid."""
    pts = _read(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("point_id"),
        ((F.col("o_orderkey") * 7 % 300) + 0.5).cast("double").alias("x"),
        ((F.col("o_orderkey") * 13 % 200) + 0.5).cast("double").alias("y"),
        ((F.col("o_orderkey") * 3 % 200) + 0.5).cast("double").alias("z"),
    )
    return nearest_cell(pts, _GS).select("point_id", "i", "j", "k")


def q_reserves_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE flagship: full reserves pipeline (vtk_reserves.py:110-134) —
    depletion by plane surfaces, box-region flagging, auto mine-weighted
    breakdown by region x lito."""
    return reserves_report(
        _fixture_grid(spark),
        "lito;grade=grade_mean,mean,density,volume;"
        "density=density_mean,mean,volume;"
        "volume=volume_sum,sum;mass=mass_sum,sum",
        regions=_BOXES,
        mine_include=[_INC],
        mine_exclude=[_EXC],
    )


# ---------------------------------------------------------------------------
# relational ops Spark gives for free (SURVEY §2.7) — shown for coverage
# ---------------------------------------------------------------------------

def q_join_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star-schema join chain with broadcast dims: revenue per nation."""
    li = _read(spark, sf_dir, "lineitem")
    orders = _read(spark, sf_dir, "orders")
    cust = _read(spark, sf_dir, "customer")
    nation = _read(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy("nation")
    )


def q_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _read(spark, sf_dir, "orders")
    return orders.orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    ).select("o_orderkey", "o_totalprice").limit(10)


def q_window_cumsum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running total per customer over order dates (window function)."""
    from pyspark.sql import Window

    orders = _read(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.sum("o_totalprice").over(w).alias("running_total"),
    )


# ---------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q_reserves_report(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "pricing_summary": q_pricing_summary,
        "flag_regions": q_flag_regions,
        "flag_regions_2d": q_flag_regions_2d,
        "mine_fraction": q_mine_fraction,
        "nearest_cell": q_nearest_cell,
        "reserves_report": q_reserves_report,
        "breakdown_stats": q_breakdown_stats,
        "breakdown_quantiles": q_breakdown_quantiles,
        "breakdown_weighted_quantile": q_breakdown_weighted_quantile,
        "breakdown_major_list": q_breakdown_major_list,
        "null_sentinel_mask": q_null_sentinel_mask,
        "grid_cells": q_grid_cells,
        "grid_heatmap": q_grid_heatmap,
        "join_revenue_by_nation": q_join_revenue_by_nation,
        "topk_orders": q_topk_orders,
        "window_cumsum": q_window_cumsum,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "flag_regions": _FIXTURE_SQL
        + """
            SELECT cell, region FROM f
        """,
        "flag_regions_2d": _FIXTURE_SQL
        + """
            SELECT cell,
                   CASE WHEN x BETWEEN 50 AND 150 AND y BETWEEN 30 AND 120
                        THEN 'r1' END AS region
            FROM f
        """,
        "mine_fraction": _FIXTURE_SQL
        + """
            SELECT cell, mine FROM f
        """,
        "nearest_cell": """
            SELECT o_orderkey AS point_id,
                   CAST(FLOOR(((o_orderkey * 7 % 300) + 0.5) / 10.0) AS INT) AS i,
                   CAST(FLOOR(((o_orderkey * 13 % 200) + 0.5) / 10.0) AS INT) AS j,
                   CAST(FLOOR(((o_orderkey * 3 % 200) + 0.5) / 10.0) AS INT) AS k
            FROM orders
        """,
        "reserves_report": _FIXTURE_SQL
        + """
            SELECT region, lito,
                   SUM(grade*density*volume*mine)
                     / NULLIF(SUM(density*volume*mine), 0) AS grade_mean,
                   SUM(density*volume*mine)
                     / NULLIF(SUM(volume*mine), 0) AS density_mean,
                   COALESCE(SUM(volume*mine), 0.0) AS volume_sum,
                   COALESCE(SUM(mass*mine), 0.0) AS mass_sum
            FROM f WHERE region != ''
            GROUP BY region, lito
        """,
        "pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   SUM(l_quantity) AS sum_qty,
                   SUM(l_extendedprice) AS sum_base_price,
                   AVG(l_quantity) AS avg_qty,
                   AVG(l_extendedprice) AS avg_price,
                   AVG(l_discount) AS avg_disc,
                   COUNT(l_quantity) AS count_order,
                   SUM(l_extendedprice*l_quantity)/SUM(l_quantity) AS wavg_price_by_qty
            FROM lineitem GROUP BY l_returnflag, l_linestatus
        """,
        "breakdown_stats": """
            SELECT l_returnflag,
                   MIN(l_quantity) AS min_qty, MAX(l_quantity) AS max_qty,
                   VAR_SAMP(l_quantity) AS var_qty,
                   STDDEV_SAMP(l_quantity) AS std_qty,
                   STDDEV_SAMP(l_quantity)/SQRT(COUNT(l_quantity)) AS sem_qty,
                   SUM(l_extendedprice*l_quantity) AS wsum_price
            FROM lineitem GROUP BY l_returnflag
        """,
        "breakdown_quantiles": """
            SELECT l_returnflag,
                   quantile_cont(l_quantity, 0.25) AS q1_qty,
                   quantile_cont(l_quantity, 0.50) AS med_qty,
                   quantile_cont(l_quantity, 0.75) AS q3_qty,
                   quantile_cont(l_extendedprice, 0.10) AS p10_price,
                   quantile_cont(l_extendedprice, 0.90) AS p90_price
            FROM lineitem GROUP BY l_returnflag
        """,
        "breakdown_weighted_quantile": """
            -- reference weighted-ECDF quantile (bm_breakdown.py:124-177):
            -- p = q*(sum(w)-1); a[searchsorted(ecdf,p,'right')] interpolated
            WITH f AS (
              SELECT l_returnflag, l_linestatus,
                     l_extendedprice AS v, l_quantity AS w
              FROM lineitem
              WHERE l_extendedprice IS NOT NULL AND l_quantity IS NOT NULL
            ), c AS (
              SELECT l_returnflag, l_linestatus, v,
                     SUM(w) OVER (PARTITION BY l_returnflag, l_linestatus
                                  ORDER BY v ROWS UNBOUNDED PRECEDING) AS cumw,
                     SUM(w) OVER (PARTITION BY l_returnflag, l_linestatus) AS wtot
              FROM f
            ), g AS (
              SELECT l_returnflag, l_linestatus,
                     MIN(CASE WHEN cumw > 0.5*(wtot-1) THEN v END) AS lo,
                     MIN(CASE WHEN cumw > 0.5*(wtot-1)+1 THEN v END) AS hi,
                     MAX(v) AS mx,
                     MAX(0.5*(wtot-1)) AS p
              FROM c GROUP BY l_returnflag, l_linestatus
            )
            SELECT l_returnflag, l_linestatus,
                   lo * (1 - (p - FLOOR(p)))
                   + COALESCE(hi, mx) * (p - FLOOR(p)) AS wq2_price
            FROM g
        """,
        "breakdown_major_list": """
            WITH cnt AS (
              SELECT l_returnflag, l_linestatus AS val, COUNT(*) AS c
              FROM lineitem WHERE l_linestatus IS NOT NULL GROUP BY 1, 2
            ), top AS (
              SELECT l_returnflag, val,
                     ROW_NUMBER() OVER (PARTITION BY l_returnflag
                                        ORDER BY c DESC, val ASC) AS rn
              FROM cnt
            )
            SELECT l.l_returnflag,
                   MAX(t.val) AS major_status,
                   string_agg(DISTINCT l.l_linestatus, ','
                              ORDER BY l.l_linestatus) AS status_list,
                   'report' AS src
            FROM lineitem l
            JOIN top t ON t.l_returnflag = l.l_returnflag AND t.rn = 1
            GROUP BY 1
        """,
        "null_sentinel_mask": """
            WITH m AS (
              SELECT l_returnflag,
                     CASE WHEN l_linenumber % 7 = 0 THEN NULL
                          ELSE l_quantity END AS qty99
              FROM lineitem
            )
            SELECT l_returnflag,
                   COALESCE(SUM(qty99), 0.0) AS sum_qty,
                   COUNT(qty99) AS cnt_qty
            FROM m GROUP BY 1
        """,
        "grid_cells": """
            SELECT r.range AS cell,
                   CAST(r.range % 30 AS INT) AS i,
                   CAST((r.range // 30) % 20 AS INT) AS j,
                   CAST(r.range // 600 AS INT) AS k,
                   0.0 + (CAST(r.range % 30 AS INT) + 0.5) * 10.0 AS x,
                   0.0 + (CAST((r.range // 30) % 20 AS INT) + 0.5) * 10.0 AS y,
                   0.0 + (CAST(r.range // 600 AS INT) + 0.5) * 10.0 AS z,
                   10.0 AS dx, 10.0 AS dy, 10.0 AS dz,
                   1000.0 AS volume
            FROM range(12000) r
        """,
        "grid_heatmap": """
            WITH g AS (
              SELECT CAST(r.range % 30 AS INT) AS i,
                     CAST((r.range // 30) % 20 AS INT) AS j,
                     CAST(r.range // 600 AS INT) AS k
              FROM range(12000) r
            )
            SELECT i, j, SUM((i*7 + j*3 + k) % 100) / 20.0 AS grade
            FROM g GROUP BY i, j
        """,
        "join_revenue_by_nation": """
            SELECT n.n_name AS nation,
                   SUM(l.l_extendedprice * (1 - l.l_discount)) AS revenue,
                   COUNT(*) AS n_items
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            GROUP BY 1
        """,
        "topk_orders": """
            SELECT o_orderkey, o_totalprice
            FROM orders
            ORDER BY o_totalprice DESC, o_orderkey ASC
            LIMIT 10
        """,
        "window_cumsum": """
            SELECT o_custkey, o_orderkey,
                   SUM(o_totalprice) OVER (
                     PARTITION BY o_custkey
                     ORDER BY o_orderdate, o_orderkey
                     ROWS UNBOUNDED PRECEDING) AS running_total
            FROM orders
        """,
    }
