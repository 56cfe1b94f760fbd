"""Operator library: the relational surface beyond the reference's own
scan path (SURVEY §2 capability gaps) plus the LLM-data-pipeline operators
(dedup, similarity search, text analysis, multimodal plumbing).
"""
