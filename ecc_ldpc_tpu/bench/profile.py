"""jax.profiler wrapper (SURVEY.md §5.1; pattern from SNIPPETS.md:101-107)."""
from __future__ import annotations

import contextlib

import jax


@contextlib.contextmanager
def trace(profile_dir: str | None):
    """Profile the enclosed block iff profile_dir is set."""
    if not profile_dir:
        yield
        return
    jax.profiler.start_trace(profile_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
