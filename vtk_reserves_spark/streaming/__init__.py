from vtk_reserves_spark.streaming.breakdown import (
    read_stream,
    run_available_now,
    session_breakdown,
    stateful_user_stats,
    windowed_breakdown,
)

__all__ = [
    "read_stream",
    "run_available_now",
    "session_breakdown",
    "stateful_user_stats",
    "windowed_breakdown",
]
