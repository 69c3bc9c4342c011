"""Sinks (SURVEY.md §2 ops 3-4)."""

from .warehouse import SchemaMismatchError, setup_sink_table, write_table

__all__ = ["setup_sink_table", "write_table", "SchemaMismatchError"]
