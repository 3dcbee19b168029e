"""nebula_importer_spark — a from-scratch PySpark-native KG-construction engine.

Re-expresses the data-processing capabilities of vesoft-inc/nebula-importer
(reference @ /root/reference, Go) as idiomatic Spark: the declarative tag/edge
schema config compiles to DataFrame Column expressions instead of nGQL strings,
and the CSV→vertex/edge mapping generalizes to a transcript→(subj,pred,obj)
triple pipeline with entity linking + canonicalization.

Nothing here is a port; reference citations in docstrings mark *behavioral*
parity points only (reference file:line).
"""

from nebula_importer_spark.config.model import (
    CsvOptions,
    EdgeSpec,
    GraphConfig,
    NodeIDSpec,
    NodeSpec,
    PropSpec,
    SourceSpec,
)
from nebula_importer_spark.plans.pipeline import Pipeline
from nebula_importer_spark.session import get_spark

__all__ = [
    "CsvOptions",
    "EdgeSpec",
    "GraphConfig",
    "NodeIDSpec",
    "NodeSpec",
    "PropSpec",
    "SourceSpec",
    "Pipeline",
    "get_spark",
]

__version__ = "0.1.0"
