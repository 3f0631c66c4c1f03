"""Text-analysis operators for LLM training-data pipelines: tokenizing,
shingling, language id, quality scoring, fingerprinting (north-star
surface beyond the reference; BASELINE.json)."""
