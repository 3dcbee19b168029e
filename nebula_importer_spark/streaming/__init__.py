from nebula_importer_spark.streaming.events import (
    run_stream_to_parquet,
    windowed_event_counts,
)

__all__ = ["run_stream_to_parquet", "windowed_event_counts"]
