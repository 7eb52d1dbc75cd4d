"""Dense-generator GF(2) encoding as an int8 MXU matmul (SURVEY.md §2.2 C10).

Host side derives a systematic generator from H by GF(2) elimination; device
side encodes batches as one int8 matmul with int32 accumulation followed by
mod-2 — the MXU-friendly formulation of the reference's G-multiply encode
(SURVEY.md §2.1 R6). Intended for small/medium n; the standards families use
encode/structured.py instead.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..codes.spec import CodeSpec
from .gf2 import gf2_matmul, gf2_row_reduce


def systematic_generator(spec: CodeSpec):
    """Derive (G, info_cols) from H.

    G: uint8 [k, n] with G @ H^T = 0 (mod 2), in ORIGINAL column order.
    info_cols: the k codeword positions that carry the message systematically
    (codeword[info_cols] == message for msg @ G).
    """
    H = spec.dense()
    R, pivot_cols = gf2_row_reduce(H)
    rank = len(pivot_cols)
    k = spec.n - rank
    info_cols = np.setdiff1d(np.arange(spec.n), pivot_cols)
    assert len(info_cols) == k
    # R restricted to pivot rows: R[r, pivot_cols] = I. For a codeword c:
    # 0 = R c = c[pivot_cols] + R[:, info_cols] c[info_cols]
    # => c[pivot_cols] = R[:rank, info_cols] @ msg, c[info_cols] = msg.
    G = np.zeros((k, spec.n), dtype=np.uint8)
    G[np.arange(k), info_cols] = 1
    G[:, pivot_cols[:rank]] = R[:rank][:, info_cols].T
    assert not np.any(gf2_matmul(G, H.T)), "G @ H^T != 0"
    return G, info_cols.astype(np.int32)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DenseEncoder:
    """Batched device encoder: bits [..., k] -> codeword [..., n]."""

    G: jax.Array  # int8 [k, n]
    info_cols: jax.Array  # int32 [k]

    @staticmethod
    def build(spec: CodeSpec) -> "DenseEncoder":
        G, info_cols = systematic_generator(spec)
        return DenseEncoder(G=jnp.asarray(G, jnp.int8), info_cols=jnp.asarray(info_cols))

    @property
    def k(self) -> int:
        return self.G.shape[0]

    @property
    def n(self) -> int:
        return self.G.shape[1]

    def __call__(self, msg_bits: jax.Array) -> jax.Array:
        acc = jax.lax.dot_general(
            msg_bits.astype(jnp.int8),
            self.G,
            dimension_numbers=(((msg_bits.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        return (acc & 1).astype(jnp.uint8)

    def extract_message(self, codeword_bits: jax.Array) -> jax.Array:
        """codeword [..., n] -> message [..., k] (systematic positions)."""
        return jnp.take(codeword_bits, self.info_cols, axis=-1)
