"""802.11n / WiMAX construction + structured encoder tests
(SURVEY.md §4.2 item 1)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ecc_ldpc_tpu.codes import ieee80211n, wimax
from ecc_ldpc_tpu.codes.ieee80211n import RATES as N_RATES
from ecc_ldpc_tpu.codes.wimax import RATES as W_RATES
from ecc_ldpc_tpu.encode.structured import (
    DualDiagonalEncoder,
    DualDiagonalPlan,
    build_encoder,
)
from ecc_ldpc_tpu.graph.qc import compile_qc_graph


@pytest.mark.parametrize("n", [648, 1296, 1944])
@pytest.mark.parametrize("rate", sorted(N_RATES))
def test_80211n_family_encodes(n, rate):
    spec = ieee80211n(n, rate)
    assert spec.n == n
    assert abs(spec.rate - N_RATES[rate]) < 1e-9
    enc = DualDiagonalEncoder(spec)  # validates G·H^T = 0 internally
    key = jax.random.key(1)
    msg = jax.random.bernoulli(key, 0.5, (8, spec.k)).astype(jnp.uint8)
    cw = enc(msg)
    assert spec.check_syndrome(np.asarray(cw))
    assert np.array_equal(np.asarray(enc.extract_message(cw)), np.asarray(msg))


@pytest.mark.parametrize("n,rate", [(576, "12"), (1152, "23A"), (2304, "56"),
                                    (960, "34B")])
def test_wimax_family_encodes(n, rate):
    spec = wimax(n, rate)
    assert spec.n == n
    enc = DualDiagonalEncoder(spec)
    key = jax.random.key(2)
    msg = jax.random.bernoulli(key, 0.5, (4, spec.k)).astype(jnp.uint8)
    assert spec.check_syndrome(np.asarray(enc(msg)))


def test_80211n_r12_table_structure():
    """The recalled standard table: protograph invariants."""
    spec = ieee80211n(648, "12")
    base = spec.qc.base
    assert base.shape == (12, 24)
    # heavy info columns 0 and 4 have weight 12 and 11-12
    assert (base[:, 0] >= 0).sum() == 12
    assert (base[:, 4] >= 0).sum() >= 11
    # special parity column (1, 0, 1)
    col = base[:, 12]
    nz = np.flatnonzero(col >= 0)
    assert list(col[nz]) == [1, 0, 1]
    # dual diagonal
    for d in range(11):
        assert base[d, 13 + d] == 0 and base[d + 1, 13 + d] == 0


def test_qc_graph_compile():
    spec = ieee80211n(648, "12")
    g = compile_qc_graph(spec)
    assert g.Z == 27 and g.mb == 12 and g.nb == 24
    assert g.num_block_edges == int((spec.qc.base >= 0).sum())
    # row/col views are consistent
    for i in range(g.mb):
        edges = g.layer_edges(i)
        assert len(edges) == int(np.asarray(g.row_mask)[i].sum())


def test_bad_args_rejected():
    with pytest.raises(ValueError):
        ieee80211n(640, "12")
    with pytest.raises(ValueError):
        ieee80211n(648, "99")
    with pytest.raises(ValueError):
        wimax(600, "12")
    with pytest.raises(ValueError):
        wimax(576, "78")


def test_build_encoder_fallback():
    from ecc_ldpc_tpu.codes import mackay_1008
    from ecc_ldpc_tpu.encode.dense import DenseEncoder

    enc = build_encoder(mackay_1008())
    assert isinstance(enc, DenseEncoder)
    enc2 = build_encoder(ieee80211n(648, "12"))
    assert isinstance(enc2, DualDiagonalEncoder)


def test_wimax_z_scaling_preserves_structure():
    for n in [576, 1056, 2304]:
        spec = wimax(n, "12")
        DualDiagonalPlan.from_spec(spec)  # raises if skeleton broken
