"""Large-scale training-data pipeline operators (dedup, similarity,
text analysis, multimodal plumbing, scoring) — all DataFrame-first."""
