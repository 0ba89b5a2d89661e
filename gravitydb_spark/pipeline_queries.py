"""Pipeline queries (placeholder)."""
