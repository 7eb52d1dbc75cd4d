"""Throughput + profiling harness (SURVEY.md §2.2 C24-C25)."""

from .throughput import BenchResult, run_benchmark

__all__ = ["BenchResult", "run_benchmark"]
