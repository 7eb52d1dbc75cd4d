"""codes.analyze: degree profiles and 4-cycle census."""
import numpy as np

from ecc_ldpc_tpu.codes import get_code
from ecc_ldpc_tpu.codes.analyze import analyze, count_4cycles, format_info
from ecc_ldpc_tpu.codes.spec import CodeSpec


def test_4cycle_census_hand_case():
    # rows 0 and 1 share columns {0, 1} -> exactly one 4-cycle
    H = np.array([
        [1, 1, 0, 0],
        [1, 1, 1, 0],
        [0, 0, 1, 1],
    ], dtype=np.uint8)
    spec = CodeSpec.from_dense(H, name="c4")
    assert count_4cycles(spec) == 1
    # three rows pairwise sharing the same 2 columns -> C(3,2) = 3 cycles
    H2 = np.array([
        [1, 1, 0],
        [1, 1, 0],
        [1, 1, 1],
    ], dtype=np.uint8)
    assert count_4cycles(CodeSpec.from_dense(H2, name="c43")) == 3


def test_analyze_mackay1008():
    info = analyze(get_code("mackay1008"))
    assert info["n"] == 1008 and info["edges"] == 3024
    assert info["row_degree_hist"] == {6: 504}
    assert info["col_degree_hist"] == {3: 1008}
    assert info["four_cycles"] == 0 and info["girth_ge_6"]
    assert "4-cycles" in format_info(info)


def test_nr5g_girth_repaired_per_lifting_size():
    """Shift reduction mod Zc must not reintroduce lifted 4-cycles: the
    per-Zc optimizer keeps BG1 4-cycle-free for Zc >= 22 and BG2 for
    Zc >= 10 (tiny Zc have pigeonhole-unavoidable residuals)."""
    for spec_str in ("nr5g/bg1/24", "nr5g/bg1/128", "nr5g/bg2/10",
                     "nr5g/bg2/64", "nr5g/bg2/160"):
        info = analyze(get_code(spec_str))
        assert info["four_cycles"] == 0, (spec_str, info["four_cycles"])


def test_qc_families_girth_and_chain_clean():
    """Every 802.11n/WiMAX config is 4-cycle-free, and surrogate tables
    also respect the chain rule (no equal shifts within row distance 8 in
    an info column — they close short cycles through the shift-0
    staircase). Z-scaling must not silently undo either property."""
    import numpy as np

    from ecc_ldpc_tpu.codes.girth import chain_conflicts

    specs = (
        [f"80211n/{n}/{r}" for n in (648, 1296, 1944)
         for r in ("12", "23", "34", "56")]
        + [f"wimax/{n}/{r}" for n in (576, 1152, 2304)
           for r in ("12", "23A", "34B", "56")]
    )
    for s in specs:
        spec = get_code(s)
        info = analyze(spec)
        assert info["four_cycles"] == 0, (s, info["four_cycles"])
        if "surrogate" in spec.name:
            qc = spec.qc
            kb = qc.nb - qc.base.shape[0]
            cc = chain_conflicts(np.asarray(qc.base), kb, 8)
            assert not cc, (s, cc)


def test_analyze_qc_block_shape():
    info = analyze(get_code("80211n/648/12"), cycles=False)
    q = info["qc"]
    assert (q["Z"], q["mb"], q["nb"]) == (27, 12, 24)
    assert "four_cycles" not in info
