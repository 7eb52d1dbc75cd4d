"""Mesh + sharding: pod-scale Monte-Carlo (SURVEY.md §1.3 L5, §2.2 C19-C21)."""

from .mesh import MeshSpec, make_mesh, maybe_init_distributed
from .montecarlo import make_sharded_step, sharded_sweep_counters

__all__ = [
    "MeshSpec",
    "make_mesh",
    "maybe_init_distributed",
    "make_sharded_step",
    "sharded_sweep_counters",
]
