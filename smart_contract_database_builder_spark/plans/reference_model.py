"""Reference-model queries (contract/function semantics) — filled in Phase 1."""
