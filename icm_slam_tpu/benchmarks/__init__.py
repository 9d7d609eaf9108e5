"""Bundled benchmarks (importable from an installed package)."""
