"""Structured-Streaming front-end: incremental transcript ingestion."""

from .incremental import incremental_extract, process_batch  # noqa: F401
