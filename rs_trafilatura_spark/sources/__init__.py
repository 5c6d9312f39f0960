"""IO + checkpoint/resume manifest."""

from .checkpoint import (
    completed_chunks,
    read_output,
    run_extraction_checkpointed,
)

__all__ = ["completed_chunks", "read_output", "run_extraction_checkpointed"]
