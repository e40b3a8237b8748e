"""Utilities: profiling/tracing helpers."""
