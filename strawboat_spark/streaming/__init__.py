"""Structured Streaming pipelines over the events table and the
strawboat streaming sink (SURVEY.md §2C streaming row, milestone M6).
"""
