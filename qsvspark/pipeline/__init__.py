"""Pipeline layer: quilt YAML DAG (reference parity) and the north-star
parse → enrich → route → aggregate pipeline over pre-tokenized sequences."""

from qsvspark.pipeline.tokens import source_dim, synth_tokens
from qsvspark.pipeline.northstar import (
    QUARANTINE_SINK,
    NorthStarPipeline,
    quarantine_stage,
)

__all__ = [
    "synth_tokens",
    "source_dim",
    "NorthStarPipeline",
    "quarantine_stage",
    "QUARANTINE_SINK",
]
