from nebula_importer_spark.sources.reader import SourceError, read_source

__all__ = ["SourceError", "read_source"]
