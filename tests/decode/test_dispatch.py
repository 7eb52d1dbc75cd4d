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


def test_choose_graph_routing():
    """The shared routing rule honors explicit backend overrides that only
    exist on the expanded graph, and keeps QC codes on the QC view
    otherwise (TPU-safe roll tiers)."""
    from ecc_ldpc_tpu.decode.api import choose_graph
    from ecc_ldpc_tpu.graph import CompiledGraph, QCGraph

    spec = codes.get_code("80211n/648/12")
    assert isinstance(choose_graph(spec, "minsum/10"), QCGraph)
    assert isinstance(choose_graph(spec, "spa/10"), QCGraph)
    assert isinstance(choose_graph(spec, "layered/10"), QCGraph)
    assert type(choose_graph(spec, "minsum/10", backend="xla-mm")) \
        is CompiledGraph
    # pallas spa/minstar ride the flooding-QC kernel on the QC view where
    # that kernel can serve the graph; 802.11n's Z=27 (Z % 8 != 0) cannot,
    # so the explicit pallas override falls back to the expanded graph +
    # fused_mm instead of raising (ADVICE r2 item 2)
    assert type(choose_graph(spec, "spa/10", backend="pallas")) \
        is CompiledGraph
    assert type(choose_graph(spec, "minsum/10", backend="pallas")) \
        is CompiledGraph
    qc_ok = codes.get_code("wimax/576/12")  # Z=24: flooding-QC serves it
    assert isinstance(choose_graph(qc_ok, "spa/10", backend="pallas"),
                      QCGraph)
    plain = codes.get_code("mackay1008")
    assert type(choose_graph(plain, "minsum/10")) is CompiledGraph


def test_pallas_override_decodes_z27_end_to_end():
    """The ADVICE r2 item-2 regression: backend='pallas' spa on 802.11n
    Z=27 must decode (fused_mm, interpret on CPU), not raise ValueError."""
    import numpy as np
    import jax.numpy as jnp

    from ecc_ldpc_tpu import build_ecc

    ecc = build_ecc("80211n/648/12", "spa/8", backend="pallas")
    msg = jnp.zeros((4, ecc.k), jnp.uint8)
    cw = ecc.encode(msg)
    llr = (1.0 - 2.0 * cw.astype(jnp.float32)) * 8.0
    res = ecc.decode(llr)
    assert np.all(np.asarray(res.ok))


def test_pallas_minstar_unservable_raises_actionable_error():
    """ADVICE r3 item 1: backend='pallas' minstar on a code flooding_qc
    can't serve (802.11n Z=27) must keep the QC view so loop.py raises the
    descriptive envelope ValueError — not route to fused_mm (spa/minsum
    only) and die with a bare KeyError."""
    from ecc_ldpc_tpu.decode.api import choose_graph
    from ecc_ldpc_tpu.graph import QCGraph

    spec = codes.get_code("80211n/648/12")
    g = choose_graph(spec, "minstar/10", backend="pallas")
    assert isinstance(g, QCGraph)
    with pytest.raises(ValueError, match="platform envelope"):
        decode.make_decoder(g, kind="minstar", backend="pallas")


def test_sched_spec_guards():
    from ecc_ldpc_tpu.decode.api import parse_decoder_spec

    with pytest.raises(ValueError, match="layered"):
        parse_decoder_spec("minsum/sched:dvbs2_64800_12_T25")
    with pytest.raises(ValueError, match="mixes"):
        parse_decoder_spec("layered/norm:0.9/sched:dvbs2_64800_12_T25")


def test_backend_override_through_sweep():
    """--backend xla-mm on a QC code must route the expanded graph (was an
    AttributeError crash when the QC view was forced)."""
    from ecc_ldpc_tpu.sim import StoppingRule, SweepSpec, run_sweep

    res = run_sweep(SweepSpec(
        code="80211n/648/12", decoder="minsum/8", backend="xla-mm",
        ebn0_db=(3.0,), batch=32,
        stopping=StoppingRule(min_frame_errors=1, max_frames=32),
    ))
    assert res[0].frames >= 32


def test_ecc_facade_routes_qc_spa():
    """build_ecc uses the shared routing: spa on a QC code decodes
    end-to-end (the roll form; the expanded gather graph is CPU-only and
    was what the facade used to compile)."""
    import numpy as np
    import jax.numpy as jnp

    from ecc_ldpc_tpu import build_ecc

    ecc = build_ecc("80211n/648/12", "spa/8")
    msg = jnp.zeros((4, ecc.k), jnp.uint8)
    cw = ecc.encode(msg)
    llr = (1.0 - 2.0 * cw.astype(jnp.float32)) * 8.0
    res = ecc.decode(llr)
    assert np.all(np.asarray(res.ok))
