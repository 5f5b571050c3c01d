"""Benchmark support: distributed synthetic-web generation + timing helpers."""
