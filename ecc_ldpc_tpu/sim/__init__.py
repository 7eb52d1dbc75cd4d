"""Monte-Carlo BER/FER simulation harness (SURVEY.md §1.3 L6, §2.2 C22-C23).

The functional equivalent of the reference's Main + ECC.Estimate pair: run
(code x decoder x Eb/N0) sweeps, batching frames per step, until a sequential
stopping rule is satisfied, then report BER/FER with confidence intervals.
"""

from .stopping import StoppingRule, wilson_interval
from .runner import PointResult, SweepSpec, run_sweep, run_sweep_sharded
from .report import format_table, results_to_json, curves_overlap

__all__ = [
    "StoppingRule",
    "wilson_interval",
    "PointResult",
    "SweepSpec",
    "run_sweep",
    "run_sweep_sharded",
    "format_table",
    "results_to_json",
    "curves_overlap",
]
