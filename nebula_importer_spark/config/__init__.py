from nebula_importer_spark.config.model import (
    CsvOptions,
    EdgeSpec,
    GraphConfig,
    NodeIDSpec,
    NodeSpec,
    PropSpec,
    SourceSpec,
)
from nebula_importer_spark.config.parse import load_config

__all__ = [
    "CsvOptions",
    "EdgeSpec",
    "GraphConfig",
    "NodeIDSpec",
    "NodeSpec",
    "PropSpec",
    "SourceSpec",
    "load_config",
]
