from vtk_reserves_spark.streaming.breakdown import (
    read_stream,
    run_available_now,
    session_breakdown,
    stateful_user_stats,
    windowed_breakdown,
)
from vtk_reserves_spark.streaming.sinks import (
    stream_to_parquet,
    stream_upsert_parquet,
)

__all__ = [
    "read_stream",
    "run_available_now",
    "session_breakdown",
    "stateful_user_stats",
    "windowed_breakdown",
    "stream_to_parquet",
    "stream_upsert_parquet",
]
