"""Host-side LDPC code construction and loading (pure Python/NumPy).

Mirrors the reference's matrix/data layer (Haskell bit-matrix loaders + shipped
code files, e.g. MacKay-style codes) — SURVEY.md §2.1 R9 — plus the standards
families the target configs require: 802.11n / WiMAX QC-LDPC, DVB-S2, 5G NR.
"""

from .spec import CodeSpec
from .alist import load_alist, save_alist, loads_alist, dumps_alist
from .matrixio import (
    load_matrix, loads_matrix, load_matlab_sparse, loads_matlab_sparse,
    dumps_matlab_sparse, load_dense, loads_dense, dumps_dense,
)
from .gallager import gallager_36
from .mackay import mackay_1008
from .qc import QCCode, expand_qc
from .ieee80211n import ieee80211n
from .ieee8023an import ieee8023an
from .wimax import wimax
from .dvbs2 import dvbs2
from .nr5g import nr5g
from .registry import get_code, list_codes

__all__ = [
    "CodeSpec", "load_alist", "save_alist", "loads_alist", "dumps_alist",
    "load_matrix", "loads_matrix", "load_matlab_sparse",
    "loads_matlab_sparse", "dumps_matlab_sparse", "load_dense",
    "loads_dense", "dumps_dense",
    "gallager_36", "mackay_1008", "QCCode", "expand_qc", "ieee80211n",
    "ieee8023an", "wimax", "dvbs2", "nr5g", "get_code", "list_codes",
]
