"""Learned decoder parameters (SURVEY.md extension; PAPERS.md NOMS)."""

from .noms import (
    NomsParams,
    list_schedules,
    load_schedule,
    train_noms,
    unrolled_posteriors,
)

__all__ = [
    "NomsParams",
    "list_schedules",
    "load_schedule",
    "train_noms",
    "unrolled_posteriors",
]
