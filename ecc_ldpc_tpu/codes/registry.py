"""String-named code registry.

The reference registers codec families under slash-separated name strings
resolved by its CLI ("ldpc/<variant>/<iters>/<matrix>", SURVEY.md §2.1 R1,
R11). Here codes and decoders are selected the same way; this module maps
code-name strings to CodeSpec constructors. Decoder specs are parsed in
cli/spec.py.

Examples:
  mackay1008                      shipped (3,6) n=1008 code
  gallager/2048/3/6/s0            (3,6)-regular n=2048, seed 0
  alist:/path/to/code.alist       load from file
  80211n/648/12                   802.11n n=648 rate 1/2  (rate as "12" etc.)
  wimax/1152/23A                  WiMAX n=1152 rate 2/3A
  dvbs2/64800/12                  DVB-S2 normal frame rate 1/2
  nr5g/bg1/208/3168               5G NR BG1, Zc=208, k=3168-style spec
  ccsds/1024/12                   CCSDS AR4JA k=1024 rate 1/2
  8023an                          IEEE 802.3an 10GBASE-T (2048, 1723)
"""
from __future__ import annotations

from typing import Callable, Dict

from .spec import CodeSpec

_REGISTRY: Dict[str, Callable[..., CodeSpec]] = {}


def register(name: str, fn: Callable[..., CodeSpec]) -> None:
    _REGISTRY[name] = fn


def list_codes():
    return sorted(_REGISTRY)


def get_code(spec_str: str) -> CodeSpec:
    """Resolve a compact code-spec string to a CodeSpec."""
    if spec_str.startswith("alist:"):
        from .alist import load_alist

        return load_alist(spec_str[len("alist:"):])
    if spec_str.startswith("mat:"):
        from .matrixio import load_matlab_sparse

        return load_matlab_sparse(spec_str[len("mat:"):])
    if spec_str.startswith("dense:"):
        from .matrixio import load_dense

        return load_dense(spec_str[len("dense:"):])
    if spec_str.startswith("file:"):
        from .matrixio import load_matrix

        return load_matrix(spec_str[len("file:"):])
    parts = spec_str.split("/")
    head, args = parts[0], parts[1:]
    if head not in _REGISTRY:
        import os

        if os.path.exists(spec_str):
            # bare path: sniff alist / MATLAB-triplet / dense 0/1 text
            from .matrixio import load_matrix

            return load_matrix(spec_str)
        raise KeyError(f"unknown code {head!r}; known: {list_codes()}")
    return _REGISTRY[head](*args)


def _register_builtins() -> None:
    from .dvbs2 import dvbs2
    from .gallager import gallager_regular
    from .ieee80211n import ieee80211n
    from .mackay import mackay_1008
    from .nr5g import nr5g
    from .wimax import wimax

    register("mackay1008", lambda: mackay_1008())

    def _gallager(n, j="3", k="6", seed="s0"):
        return gallager_regular(int(n), int(j), int(k), seed=int(seed.lstrip("s")))

    register("gallager", _gallager)
    register("80211n", lambda n, rate: ieee80211n(int(n), rate))
    register("wimax", lambda n, rate: wimax(int(n), rate))
    register("dvbs2", lambda n, rate: dvbs2(int(n), rate))
    def _nr5g(bg, zc, k=None, n_tx=None, rv=None):
        # 'nr5g/bg1/384/8448/12672/rv2' — redundancy version as a trailing
        # 'rvN' component (38.212 §5.4.2.1 circular buffer; codes/nr5g.py)
        return nr5g(
            bg, int(zc),
            None if k is None else int(k),
            None if n_tx is None else int(n_tx),
            None if rv is None else int(rv.lstrip("rv")),
        )

    register("nr5g", _nr5g)

    def _punct(inner, positions):
        from .puncture import parse_positions, puncture

        spec = get_code(inner.replace("~", "/"))
        return puncture(spec, parse_positions(positions, spec.n))

    register("punct", _punct)

    def _ccsds(k, rate, seed="s0"):
        from .ccsds import ar4ja
        return ar4ja(int(k), rate, seed=int(seed.lstrip("s")))

    register("ccsds", _ccsds)

    def _8023an():
        from .ieee8023an import ieee8023an

        return ieee8023an()

    register("8023an", _8023an)

    def _sc(j, k, l, z, seed="s0"):
        from .sc import sc_regular

        return sc_regular(int(j), int(k), int(l), int(z),
                          seed=int(seed.lstrip("s")))

    register("sc", _sc)


_register_builtins()
