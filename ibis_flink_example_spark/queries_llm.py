"""North-star LLM-pipeline queries (SURVEY.md §2.11 X1-X5): dedup, similarity
search, text analysis, multimodal columns. Populated in M4."""
