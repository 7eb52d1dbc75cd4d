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
    per-Zc optimizer keeps BG1 4-cycle-free for Zc >= 22 and BG2 (with
    the recalled, denser-core connectivity) for Zc >= 16; tinier Zc have
    pigeonhole-unavoidable residuals in the degree-(8,10,8,10) core."""
    for spec_str in ("nr5g/bg1/24", "nr5g/bg1/128", "nr5g/bg2/16",
                     "nr5g/bg2/64", "nr5g/bg2/160"):
        info = analyze(get_code(spec_str))
        assert info["four_cycles"] == 0, (spec_str, info["four_cycles"])


def test_qc_families_girth_and_chain_clean():
    """Every 802.11n config is 4-cycle-free; WiMAX tables are the
    recalled standard tables under the standard's own floor/mod scaling,
    so the cycles the STANDARD's scaling closes at small Z are kept
    faithfully (rate 5/6, degree-20 rows: one block 4-cycle at Z=24 and
    Z=48 -> Z lifted cycles each). Re-repairing at scaled Z would change
    the code; this pins the faithful counts instead."""
    specs = (
        [f"80211n/{n}/{r}" for n in (648, 1296, 1944)
         for r in ("12", "23", "34", "56")]
        + [f"wimax/{n}/{r}" for n in (576, 1152, 2304)
           for r in ("12", "23A", "34B", "56")]
    )
    standard_scaling_cycles = {"wimax/576/56": 48, "wimax/1152/56": 48}
    for s in specs:
        spec = get_code(s)
        info = analyze(spec)
        expect = standard_scaling_cycles.get(s, 0)
        assert info["four_cycles"] == expect, (s, info["four_cycles"])


def test_analyze_qc_block_shape():
    info = analyze(get_code("80211n/648/12"), cycles=False)
    q = info["qc"]
    assert (q["Z"], q["mb"], q["nb"]) == (27, 12, 24)
    assert "four_cycles" not in info
