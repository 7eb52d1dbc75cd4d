"""Placeholder — implemented in a later milestone (see SURVEY.md §7.1)."""
from __future__ import annotations


def wimax(*args, **kwargs):
    raise NotImplementedError("wimax tables land in a later milestone")
