"""Learned decoder parameters (SURVEY.md extension; PAPERS.md NOMS)."""

from .noms import NomsParams, train_noms, unrolled_posteriors

__all__ = ["NomsParams", "train_noms", "unrolled_posteriors"]
