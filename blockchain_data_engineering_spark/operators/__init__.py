"""Operator library — SURVEY.md §2.2-2.8 relational/analytic building
blocks plus the LLM-data-pipeline extension operators (dedup,
similarity, text analysis, multimodal, ML evaluation, entity linkage,
data quality, quantile sketches, weighted priority sampling,
Misra-Gries heavy hitters)."""
