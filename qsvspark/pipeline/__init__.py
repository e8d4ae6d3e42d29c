"""Pipeline layer: quilt YAML DAG (reference parity) and the north-star
parse → enrich → route → aggregate pipeline over pre-tokenized sequences."""

from qsvspark.pipeline.tokens import source_dim, synth_tokens
from qsvspark.pipeline.northstar import (
    QUARANTINE_SINK,
    NorthStarPipeline,
    decontaminate_stage,
    enrich_stage_salted,
    quarantine_stage,
    salted_join,
    token_ngram_hashes,
)

__all__ = [
    "synth_tokens",
    "source_dim",
    "NorthStarPipeline",
    "quarantine_stage",
    "QUARANTINE_SINK",
    "salted_join",
    "enrich_stage_salted",
    "decontaminate_stage",
    "token_ngram_hashes",
]
