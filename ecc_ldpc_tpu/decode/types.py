"""Decoder result container."""
from __future__ import annotations

import dataclasses

import jax


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DecodeResult:
    """Batched decode output.

    bits: uint8 [B, n] hard decisions for the full codeword.
    ok: bool [B] — True iff the syndrome is zero (valid codeword found).
    iterations: int32 [B] — BP iterations actually used per codeword (with
      early termination this is where the syndrome first cleared; capped at
      max_iters). The reference reports the same via its per-frame decode
      bookkeeping; mean(iterations) keeps early-termination throughput
      accounting honest (SURVEY.md §7.2 item 3).
    """

    bits: jax.Array
    ok: jax.Array
    iterations: jax.Array
