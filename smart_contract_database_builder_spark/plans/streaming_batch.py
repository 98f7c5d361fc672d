"""Batch-equivalent views of streaming operators — filled in Phase 5."""
