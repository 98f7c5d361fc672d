"""LLM-pipeline EXT operators (dedup/similarity/text) — filled in Phase 4."""
