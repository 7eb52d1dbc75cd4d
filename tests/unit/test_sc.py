"""Spatially-coupled LDPC tests (codes/sc.py).

The headline property is threshold saturation: coupling the (3,6)
ensemble moves its BP threshold from 0.4294 to the uncoupled MAP
threshold ~0.4881 over the BEC — the exact protograph DE reproduces
this, and the finite-length codes decode between the two thresholds
where the uncoupled ensemble fails.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ecc_ldpc_tpu.codes import get_code
from ecc_ldpc_tpu.codes.threshold import bec_threshold, de_threshold_ebn0
from ecc_ldpc_tpu.encode.gf2 import gf2_rank


def test_structure_and_rank():
    spec = get_code("sc/3/6/20/16")
    vpp, L, J, Z = 2, 20, 3, 16
    assert spec.n == vpp * L * Z
    assert spec.m == (L + J - 1) * Z
    assert spec.k == spec.n - gf2_rank(spec.dense())
    # interior checks degree 6, terminated boundary lower
    deg = spec.row_deg
    assert deg.max() == 6 and deg.min() >= 2
    # every variable degree 3 (edge spreading preserves column regularity)
    assert set(spec.col_deg.tolist()) == {3}


def test_threshold_saturation_bec():
    """Coupled (3,6) at L=20: exact-DE BEC threshold within a hair of the
    uncoupled MAP threshold 0.4881 — the saturation phenomenon."""
    coupled = bec_threshold(get_code("sc/3/6/20/16"))
    uncoupled = bec_threshold(get_code("mackay1008"))
    assert abs(uncoupled - 0.4294) < 2e-3
    assert coupled > 0.475  # saturated toward 0.4881
    assert coupled - uncoupled > 0.04


def test_threshold_improves_awgn():
    coupled = de_threshold_ebn0(get_code("sc/3/6/20/16"))
    assert coupled < 1.05  # uncoupled (3,6) GA-DE reads 1.149


def test_decodes_between_thresholds():
    """At eps between 0.4294 (uncoupled BP) and 0.488 (coupled), the SC
    code corrects most frames while the uncoupled code drowns."""
    from ecc_ldpc_tpu.ecc import build_ecc

    key = jax.random.key(0)
    km, kc = jax.random.split(key)

    def fer(code, eps):
        ecc = build_ecc(code, "minsum/150", channel=f"bec:{eps}")
        msg = jax.random.bernoulli(km, 0.5, (64, ecc.k)).astype(jnp.uint8)
        out = ecc.decode(ecc.transmit(kc, ecc.encode(msg), 0.0))
        return float(jnp.mean(~out.ok))

    eps = 0.46
    f_sc = fer("sc/3/6/30/64", eps)
    f_reg = fer("gallager/1008/3/6/s1", eps)
    assert f_reg > 0.9  # well above the uncoupled threshold
    assert f_sc < f_reg - 0.4


def test_invalid_params():
    from ecc_ldpc_tpu.codes.sc import sc_regular

    with pytest.raises(ValueError):
        sc_regular(3, 7, 20, 16)  # J does not divide K
    with pytest.raises(ValueError):
        sc_regular(3, 6, 2, 16)  # chain shorter than the window
