"""Job assembly: scan -> repartition -> kernel -> write, plus metrics."""

from .job import run_extraction, size_aware_repartition, salted_host, stage_metrics
from .schema import OUTPUT_SCHEMA, OUTPUT_COLUMNS

__all__ = [
    "OUTPUT_COLUMNS",
    "OUTPUT_SCHEMA",
    "run_extraction",
    "salted_host",
    "size_aware_repartition",
    "stage_metrics",
]
