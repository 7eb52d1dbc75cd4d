"""Compiled quasi-cyclic graph: block-edge lists for roll-based kernels.

The TPU-native representation of QC-LDPC codes (SURVEY.md §2.2 C8/C18): a
message slab for one Z x Z circulant block is laid out [Z, batch] with Z on
sublanes and batch on lanes, so applying the circulant permutation P^s is a
*roll* along the sublane axis — jnp.roll (static shifts, XLA tier) or
pltpu.roll (dynamic shifts from SMEM, Pallas tier). No gather/scatter exists
anywhere in the QC decode path, which sidesteps both the platform's
gather-chain compiler bug and TPU's lack of vector-gather.

Alignment convention: a slab associated with block-edge e is CHECK-aligned
(indexed by the check's row r inside the block-row). Check r connects to
variable (r + shift) % Z, so:
  variable-aligned view = roll(check_aligned, +shift)
  check-aligned view    = roll(variable_aligned, -shift)
with roll(x, s)[i] = x[(i - s) % Z] (np.roll semantics; pltpu.roll matches).

Block-permutation families (perm="xor"): IEEE 802.3an's RS-based H is six
64-row blocks where check r connects variable r XOR s (codes/ieee8023an.py)
— GF(2)-additive permutations, not circulants. The same [Z, batch] slab
layout serves them with the roll replaced by xor_perm (reshape + flip on
the bit axes of s — one XLA reverse op, still gather-free and TPU-legal).
XOR perms are involutions, so both alignment directions apply the SAME
permutation. QCGraph.perm selects the block-permutation kind; the XLA
tiers consume it through to_check_align/to_var_align below.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..codes.qc import QCCode
from ..codes.spec import CodeSpec


def xor_perm(x: jax.Array, s: int) -> jax.Array:
    """y[i] = x[i ^ s] along axis 0 (static s; axis length a power of two).

    Realized as reshape to (2,)*b + flip of the bit-axes set in s + reshape
    back: flipping bit-axis a maps index bit -> 1-bit, so the composite is
    exactly XOR-by-s. One XLA reverse op — no gather, no dynamic slices."""
    if s == 0:
        return x
    Z = x.shape[0]
    b = Z.bit_length() - 1
    if (1 << b) != Z or not 0 < s < Z:
        raise ValueError(f"xor_perm needs power-of-two axis, 0<=s<Z (Z={Z}, s={s})")
    xr = x.reshape((2,) * b + x.shape[1:])
    axes = tuple(a for a in range(b) if (s >> (b - 1 - a)) & 1)
    return jnp.flip(xr, axis=axes).reshape(x.shape)


def to_check_align(x: jax.Array, s: int, perm: str) -> jax.Array:
    """Variable-aligned -> check-aligned view of a [Z, ...] slab."""
    if perm == "xor":
        return xor_perm(x, int(s))
    return jnp.roll(x, -int(s), axis=0)


def to_var_align(x: jax.Array, s: int, perm: str) -> jax.Array:
    """Check-aligned -> variable-aligned view of a [Z, ...] slab."""
    if perm == "xor":
        return xor_perm(x, int(s))
    return jnp.roll(x, int(s), axis=0)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class QCGraph:
    """Device-ready QC graph."""

    # static
    Z: int = dataclasses.field(metadata=dict(static=True))
    mb: int = dataclasses.field(metadata=dict(static=True))
    nb: int = dataclasses.field(metadata=dict(static=True))
    num_block_edges: int = dataclasses.field(metadata=dict(static=True))
    dcb_max: int = dataclasses.field(metadata=dict(static=True))
    dvb_max: int = dataclasses.field(metadata=dict(static=True))
    k: int = dataclasses.field(metadata=dict(static=True))
    name: str = dataclasses.field(metadata=dict(static=True))
    # block-permutation kind: "roll" (circulant P^s) or "xor" (a -> a^s);
    # the XLA tiers route every alignment change through to_check_align/
    # to_var_align, the Pallas tiers serve "roll" only (supports() gates)
    perm: str = dataclasses.field(metadata=dict(static=True))
    # host-side copies for trace-time (static) unrolling in the XLA tier
    be_row_np: tuple = dataclasses.field(metadata=dict(static=True))
    be_col_np: tuple = dataclasses.field(metadata=dict(static=True))
    be_shift_np: tuple = dataclasses.field(metadata=dict(static=True))

    # device data (for the Pallas tier: shifts via scalar prefetch)
    be_row: jax.Array  # int32 [BE]
    be_col: jax.Array  # int32 [BE]
    be_shift: jax.Array  # int32 [BE]
    row_be: jax.Array  # int32 [mb, dcb_max]  block-edge ids per block-row
    row_mask: jax.Array  # bool [mb, dcb_max]
    col_be: jax.Array  # int32 [nb, dvb_max]
    col_mask: jax.Array  # bool [nb, dvb_max]

    @property
    def n(self) -> int:
        return self.nb * self.Z

    @property
    def m(self) -> int:
        return self.mb * self.Z

    def to_check(self, x: jax.Array, s: int) -> jax.Array:
        """Variable-aligned -> check-aligned [Z, ...] slab view."""
        return to_check_align(x, s, self.perm)

    def to_var(self, x: jax.Array, s: int) -> jax.Array:
        """Check-aligned -> variable-aligned [Z, ...] slab view."""
        return to_var_align(x, s, self.perm)

    def layer_edges(self, i: int):
        """Host-side (edge_id, col, shift) triples of block-row i."""
        out = []
        for e in range(self.num_block_edges):
            if self.be_row_np[e] == i:
                out.append((e, self.be_col_np[e], self.be_shift_np[e]))
        return out

    @property
    def layer_order(self):
        """Canonical layered processing order: block-rows stably sorted by
        degree. Degree-grouping lets the Pallas kernel run one exact-degree
        unrolled loop per group (no padding slots, no validity masks); the
        XLA oracle iterates the same order so both tiers share fixed
        points. Any fixed row order is a valid layered schedule."""
        degs = [len(self.layer_edges(i)) for i in range(self.mb)]
        return tuple(sorted(range(self.mb), key=lambda i: degs[i]))

    @property
    def intra_layer_dup_free(self) -> bool:
        """True when no block-row touches the same block-column twice.

        Gates the alignment-carrying ("delta shift") layered update used by
        both decode tiers: posteriors are stored in the rotation of the last
        layer that touched them and written back as `slab + Cnew` (one roll
        per edge-visit instead of two). With a duplicate column inside one
        layer the second write would clobber the first's message update, so
        such graphs take the 2-roll delta-add path instead. Standard QC
        tables (802.11n/WiMAX/DVB-S2/5G NR) have one shift per base cell,
        hence no duplicates."""
        for i in range(self.mb):
            cols = [c for _, c, _ in self.layer_edges(i)]
            if len(cols) != len(set(cols)):
                return False
        return True

    @property
    def layer_groups(self):
        """(degree, rows_tuple) groups following layer_order."""
        order = self.layer_order
        groups = []
        for i in order:
            d = len(self.layer_edges(i))
            if groups and groups[-1][0] == d:
                groups[-1][1].append(i)
            else:
                groups.append((d, [i]))
        return tuple((d, tuple(rows)) for d, rows in groups)


def qc_graph_from_block_edges(
    Z: int, mb: int, nb: int, br, bc, sh, *, k: int, name: str = "qc",
    perm: str = "roll",
) -> QCGraph:
    """Build a QCGraph from explicit (block_row, block_col, shift) triples.

    Unlike compile_qc_graph (whose QCCode base matrix holds one shift per
    cell), this admits PARALLEL block-edges — multi-edge protographs, where
    a block-row touches the same block-column through two different
    circulants. Such graphs have intra_layer_dup_free == False and route
    both layered tiers onto their accumulate ("classic" 2-roll) paths."""
    br = np.asarray(br, np.int32)
    bc = np.asarray(bc, np.int32)
    sh = np.asarray(sh, np.int32)
    BE = len(br)
    if perm not in ("roll", "xor"):
        raise ValueError(f"perm must be 'roll' or 'xor', got {perm!r}")
    if perm == "xor" and Z & (Z - 1):
        raise ValueError(f"xor-perm blocks need power-of-two Z, got {Z}")
    if np.any(sh < 0) or np.any(sh >= Z):
        raise ValueError("shifts must lie in [0, Z)")
    if len(bc) != BE or len(sh) != BE:
        raise ValueError("br, bc, sh must have equal length")
    if BE and (br.min() < 0 or br.max() >= mb):
        raise ValueError(f"block rows must lie in [0, {mb})")
    if BE and (bc.min() < 0 or bc.max() >= nb):
        raise ValueError(f"block cols must lie in [0, {nb})")
    dcb = np.bincount(br, minlength=mb)
    dvb = np.bincount(bc, minlength=nb)
    dcb_max, dvb_max = int(dcb.max()), int(dvb.max())

    row_be = np.zeros((mb, dcb_max), np.int32)
    row_mask = np.zeros((mb, dcb_max), bool)
    col_be = np.zeros((nb, dvb_max), np.int32)
    col_mask = np.zeros((nb, dvb_max), bool)
    fr = np.zeros(mb, np.int32)
    fc = np.zeros(nb, np.int32)
    for e in range(BE):
        i, j = br[e], bc[e]
        row_be[i, fr[i]] = e
        row_mask[i, fr[i]] = True
        fr[i] += 1
        col_be[j, fc[j]] = e
        col_mask[j, fc[j]] = True
        fc[j] += 1

    return QCGraph(
        Z=Z, mb=mb, nb=nb, num_block_edges=BE,
        dcb_max=dcb_max, dvb_max=dvb_max, k=k, name=name, perm=perm,
        be_row_np=tuple(int(x) for x in br),
        be_col_np=tuple(int(x) for x in bc),
        be_shift_np=tuple(int(x) for x in sh),
        be_row=br, be_col=bc, be_shift=sh,
        row_be=row_be, row_mask=row_mask, col_be=col_be, col_mask=col_mask,
    )


def compile_qc_graph(spec: CodeSpec) -> QCGraph:
    qc: QCCode = spec.qc
    if qc is None:
        raise ValueError(f"code {spec.name!r} has no QC structure")
    br, bc, sh = qc.block_edges()
    return qc_graph_from_block_edges(
        qc.Z, qc.mb, qc.nb, br, bc, sh, k=spec.k, name=spec.name,
        perm=getattr(qc, "perm", "roll"),
    )
