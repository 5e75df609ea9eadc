"""Operators (SURVEY.md §2): routing, rotation, projection/evolution, and the
LLM-data-pipeline extensions (dedup, similarity, text, multimodal)."""
