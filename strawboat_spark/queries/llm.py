"""LLM training-data pipeline queries (dedup / similarity / text /
multimodal) — filled in alongside operators. See SURVEY.md §2C ⊕ rows.
"""
