"""Column-level function libraries: data quality, enrichment, text analysis,
fuzzy dedup, similarity search, multimodal stubs."""
