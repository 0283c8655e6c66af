"""Custom operators: as-of join, dedup family, similarity search, text, multimodal."""
