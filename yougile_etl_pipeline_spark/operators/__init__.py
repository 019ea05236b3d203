"""Engine operators: relational, reshape, dedup, similarity, text, multimodal."""
