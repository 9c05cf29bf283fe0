from fastdup_spark.streaming.incremental import high_water_mark, incremental_update

__all__ = ["high_water_mark", "incremental_update"]
