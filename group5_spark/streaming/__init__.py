"""Structured Streaming jobs (SURVEY §2 B-4 + Phase S stretch)."""
