"""IO + checkpoint/resume manifest."""

from .checkpoint import (
    completed_chunks,
    read_output,
    run_extraction_checkpointed,
)

from .fastscan import extract_from_parquet

from .tables import (
    detect_format,
    iceberg_available,
    read_pages,
    write_output,
)

__all__ = [
    "completed_chunks", "read_output", "run_extraction_checkpointed",
    "extract_from_parquet",
    "detect_format", "iceberg_available", "read_pages", "write_output",
]
