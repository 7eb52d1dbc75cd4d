"""Placeholder — layered schedule lands with the QC milestone (SURVEY.md §7.1 M4)."""
from __future__ import annotations


def make_layered_decoder(*args, **kwargs):
    raise NotImplementedError("layered schedule lands in the QC milestone")
