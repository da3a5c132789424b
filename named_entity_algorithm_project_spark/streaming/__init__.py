"""Structured-Streaming front-end: incremental transcript ingestion."""

from .incremental import incremental_extract  # noqa: F401
