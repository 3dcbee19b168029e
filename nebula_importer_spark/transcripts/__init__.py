from nebula_importer_spark.transcripts.generate import (
    gen_corpus_local,
    gen_transcripts_spark,
)
from nebula_importer_spark.transcripts.pipeline import TranscriptPipeline

__all__ = ["gen_corpus_local", "gen_transcripts_spark", "TranscriptPipeline"]
