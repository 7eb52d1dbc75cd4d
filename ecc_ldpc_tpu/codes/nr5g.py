"""Placeholder — implemented in a later milestone (see SURVEY.md §7.1)."""
from __future__ import annotations


def nr5g(*args, **kwargs):
    raise NotImplementedError("nr5g tables land in a later milestone")
