"""Sources, sinks, and the snapshot/manifest checkpoint layer."""

from qsvspark.io.load import load
from qsvspark.io.sinks import (
    dump,
    dumpcache,
    headers,
    partition,
    show,
    showquery,
    showtable,
    stats,
)
from qsvspark.io.snapshot import SnapshotCatalog

__all__ = [
    "load",
    "show", "showtable", "headers", "stats", "showquery",
    "dump", "dumpcache", "partition",
    "SnapshotCatalog",
]
