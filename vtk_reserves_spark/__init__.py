"""vtk_reserves_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of pemn/vtk_reserves.

The reference (single-node pandas/numpy/pyvista) is re-expressed Spark-first:

- tabular layer  -> ``sources``   (loaders/writers, -99 null normalization)
- breakdown      -> ``operators.breakdown`` (groupBy().agg() compilation)
- voxel grids    -> ``sources.grid`` (virtual grid DataFrames, no geometry
                    materialization)
- meshes/spatial -> ``sources.mesh`` + ``operators.spatial`` (broadcast
                    meshes, column-expression / pandas-UDF predicates)
- reserves       -> ``operators.reserves`` (the flagship pipeline)
- LLM-pipeline   -> ``operators.dedup`` / ``operators.similarity`` /
                    ``functions.text`` / ``operators.multimodal``
- streaming      -> ``streaming.breakdown_stream``

See SURVEY.md for the full blueprint and reference file:line citations.
"""

from __future__ import annotations

from vtk_reserves_spark.plans.commalist import commalist, parse_commalist
from vtk_reserves_spark.operators.breakdown import breakdown
from vtk_reserves_spark.sources.grid import GridSchema, grid_df

__all__ = [
    "commalist",
    "parse_commalist",
    "breakdown",
    "GridSchema",
    "grid_df",
]

__version__ = "0.1.0"
