"""Sinks (SURVEY.md S7-S11): DuckDB single-writer sink + source export."""
