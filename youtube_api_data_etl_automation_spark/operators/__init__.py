"""Engine operators: incremental protocol, dedup family, similarity search,
text analysis, multimodal column processing."""
