"""Large-scale training-data pipeline operators (dedup, text analysis,
similarity search, multimodal plumbing) — Ray-Data-first companions to
the fulltext core."""
