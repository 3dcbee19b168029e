from nebula_importer_spark.plans.merge import TableStore
from nebula_importer_spark.plans.metrics import ElementStats, RunResult
from nebula_importer_spark.plans.pipeline import Pipeline

__all__ = ["TableStore", "ElementStats", "RunResult", "Pipeline"]
