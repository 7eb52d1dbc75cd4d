"""GF(2) encoders (SURVEY.md §1.3 L3)."""

from .dense import DenseEncoder, systematic_generator
from .gf2 import gf2_rank, gf2_row_reduce

__all__ = ["DenseEncoder", "systematic_generator", "gf2_rank", "gf2_row_reduce"]
