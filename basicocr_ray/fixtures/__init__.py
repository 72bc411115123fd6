"""Deterministic synthetic fixtures (FIXTURES.md)."""
