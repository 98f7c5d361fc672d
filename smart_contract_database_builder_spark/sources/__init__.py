"""Batch and streaming sources."""

from .tables import load_table, load_tables, register_views  # noqa: F401
