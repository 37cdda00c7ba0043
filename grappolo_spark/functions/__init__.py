"""Training-data pipeline operators: dedup, similarity search, text analysis,
multimodal plumbing — the operations a 100 TB corpus job needs beyond the
graph algorithms."""
