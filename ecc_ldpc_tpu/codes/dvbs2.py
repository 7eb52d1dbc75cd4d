"""Placeholder — implemented in a later milestone (see SURVEY.md §7.1)."""
from __future__ import annotations


def dvbs2(*args, **kwargs):
    raise NotImplementedError("dvbs2 tables land in a later milestone")
