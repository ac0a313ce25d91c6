"""Column-level functions: text extraction, dedup, similarity, analysis."""
