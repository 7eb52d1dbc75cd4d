"""Decoder-dispatch guards (decode/api.py): the auto backend must never
fall through to a tier that crashes the TPU platform compiler, and
backend='pallas' layered must demand a QCGraph up front."""
from unittest import mock

import jax
import pytest

from ecc_ldpc_tpu import codes, decode
from ecc_ldpc_tpu.graph import compile_graph


@pytest.fixture(scope="module")
def plain_graph():
    return compile_graph(codes.get_code("mackay1008"))


def test_pallas_layered_rejects_non_qc_graph(plain_graph):
    with pytest.raises(TypeError, match="QCGraph"):
        decode.make_decoder(plain_graph, kind="layered", backend="pallas")


def test_auto_tpu_raises_for_unroutable_request():
    """On TPU, a non-QC graph too large for the incidence tiers with a kind
    they don't serve has NO safe backend — must raise, not silently pick
    the gather tier (which SIGSEGVs the platform compiler)."""
    spec = codes.get_code("gallager/9000/3/6")
    g = compile_graph(spec)
    with mock.patch.object(jax, "default_backend", return_value="tpu"):
        with pytest.raises(NotImplementedError, match="no TPU backend"):
            decode.make_decoder(g, kind="minstar", backend="auto")


def test_auto_cpu_still_routes_everything(plain_graph):
    dec = decode.make_decoder(plain_graph, kind="minstar", backend="auto")
    assert callable(dec)
