"""Deterministic synthetic-data generator (SURVEY §2 A18-A20)."""
