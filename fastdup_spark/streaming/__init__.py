from fastdup_spark.streaming.incremental import high_water_mark, incremental_update
from fastdup_spark.streaming.stream import PAGES_SCHEMA, stream_pages

__all__ = ["high_water_mark", "incremental_update", "stream_pages", "PAGES_SCHEMA"]
