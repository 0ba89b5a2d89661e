"""Graph-engine queries (placeholder, filled in below)."""
