from fastdup_spark.plans.store import StageStore
from fastdup_spark.plans.pipeline import FastdupSpark

__all__ = ["StageStore", "FastdupSpark"]
