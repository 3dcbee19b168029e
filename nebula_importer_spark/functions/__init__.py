from nebula_importer_spark.functions.filter_dsl import compile_filter
from nebula_importer_spark.functions.picker import (
    compile_id,
    compile_prop,
    compile_rank,
)
from nebula_importer_spark.functions.types import convert_type

__all__ = ["compile_filter", "compile_id", "compile_prop", "compile_rank", "convert_type"]
