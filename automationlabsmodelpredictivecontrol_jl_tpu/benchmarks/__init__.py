"""Benchmark plants and harnesses."""
