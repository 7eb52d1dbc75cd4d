"""Placeholder — implemented in a later milestone (see SURVEY.md §7.1)."""
from __future__ import annotations


def ieee80211n(*args, **kwargs):
    raise NotImplementedError("ieee80211n tables land in a later milestone")
