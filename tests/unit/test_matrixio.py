"""MATLAB-sparse-triplet + dense 0/1 matrix text formats (C1 completion).

The reference ships matrices as text listings (SURVEY.md §2.1 R9); these
tests pin round-trips, format sniffing, and registry/CLI path acceptance.
"""
import numpy as np
import pytest

from ecc_ldpc_tpu.codes import (
    CodeSpec, dumps_alist, dumps_dense, dumps_matlab_sparse, get_code,
    loads_dense, loads_matlab_sparse, loads_matrix,
)
from ecc_ldpc_tpu.codes.matrixio import sniff_format


def _hamming74() -> CodeSpec:
    H = np.array([
        [1, 1, 0, 1, 1, 0, 0],
        [1, 0, 1, 1, 0, 1, 0],
        [0, 1, 1, 1, 0, 0, 1],
    ], np.uint8)
    rc = tuple(np.flatnonzero(H[i]).astype(np.int32) for i in range(3))
    return CodeSpec(name="hamming74", n=7, m=3, row_cols=rc)


def _same_H(a: CodeSpec, b: CodeSpec) -> bool:
    return (
        a.n == b.n and a.m == b.m
        and all(np.array_equal(x, y) for x, y in zip(a.row_cols, b.row_cols))
    )


def test_matlab_round_trip():
    spec = _hamming74()
    again = loads_matlab_sparse(dumps_matlab_sparse(spec))
    assert _same_H(spec, again)


def test_dense_round_trip():
    spec = _hamming74()
    again = loads_dense(dumps_dense(spec))
    assert _same_H(spec, again)


def test_matlab_size_pin_and_comments():
    text = "% H for a tiny code\n1 1\n1 3\n2 2 1\n3 4 0\n"
    spec = loads_matlab_sparse(text)
    assert (spec.m, spec.n) == (3, 4)  # pinned beyond the largest entry
    assert list(spec.row_cols[0]) == [0, 2]
    assert list(spec.row_cols[2]) == []  # padding row from the pin


def test_matlab_rejects_even_values_and_bad_lines():
    with pytest.raises(ValueError, match="ambiguous"):
        loads_matlab_sparse("1 1 2\n")
    with pytest.raises(ValueError, match="expected"):
        loads_matlab_sparse("1 2 3 4\n")
    with pytest.raises(ValueError, match="1-based"):
        loads_matlab_sparse("0 1\n")


def test_dense_unspaced_and_width_check():
    spec = loads_dense("0110\n1001\n")
    assert (spec.m, spec.n) == (2, 4)
    assert list(spec.row_cols[0]) == [1, 2]
    with pytest.raises(ValueError, match="width"):
        loads_dense("01\n011\n")


def test_sniffing():
    spec = _hamming74()
    assert sniff_format(dumps_alist(spec)) == "alist"
    assert sniff_format(dumps_matlab_sparse(spec)) == "matlab"
    assert sniff_format(dumps_dense(spec)) == "dense"
    for dump in (dumps_alist, dumps_matlab_sparse, dumps_dense):
        assert _same_H(spec, loads_matrix(dump(spec)))


def test_sniffing_prefers_triplet_over_binary_lookalike():
    """ADVICE r2 item 4: a MATLAB triplet file whose indices are all-0/1
    digits (rows/cols 1, 10, 11, ...) must load as a triplet matrix, not
    silently as a dense 0/1 matrix."""
    text = "1 1\n10 11\n11 100\n100 110\n"
    assert sniff_format(text) == "matlab"
    spec = loads_matrix(text)
    assert (spec.m, spec.n) == (100, 110)
    assert list(spec.row_cols[0]) == [0]
    assert list(spec.row_cols[9]) == [10]


def test_sniffing_spaced_narrow_dense():
    """ADVICE r3 item 3: a SPACE-separated dense 0/1 matrix with 2-3
    columns ('0 1 1' rows) must not silently misparse as a MATLAB triplet
    — all-0/1 tokens mean no credible 1-based index beyond a 1x1 case."""
    text = "0 1 1\n1 0 1\n"
    assert sniff_format(text) == "dense"
    spec = loads_matrix(text)
    assert (spec.m, spec.n) == (2, 3)
    assert list(spec.row_cols[0]) == [1, 2]


def test_registry_prefixes_and_bare_path(tmp_path):
    spec = _hamming74()
    p = tmp_path / "h74.txt"
    p.write_text(dumps_matlab_sparse(spec))
    for spec_str in (f"mat:{p}", f"file:{p}", str(p)):
        assert _same_H(spec, get_code(spec_str))
    d = tmp_path / "h74.dense"
    d.write_text(dumps_dense(spec))
    assert _same_H(spec, get_code(f"dense:{d}"))
    with pytest.raises(KeyError, match="unknown code"):
        get_code("no-such-code/1/2")


def test_cli_codes_info_accepts_path(tmp_path, capsys):
    from ecc_ldpc_tpu.cli.main import main

    p = tmp_path / "h74.mat"
    p.write_text(dumps_matlab_sparse(_hamming74()))
    assert main(["codes", "--info", str(p)]) == 0
    out = capsys.readouterr().out
    assert "n=7" in out.replace(" ", "") or "7" in out
