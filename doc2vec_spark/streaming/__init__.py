"""Structured Streaming surface (SURVEY 2.9 tail)."""
