"""LLM-data-pipeline operators: dedup, similarity, text, multimodal."""
