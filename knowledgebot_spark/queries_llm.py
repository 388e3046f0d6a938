"""LLM-data-pipeline query catalog (dedup, similarity, text analysis)."""
