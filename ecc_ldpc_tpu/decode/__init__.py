"""LDPC decoders.

Two tiers, mirroring the reference's decoder-tier architecture (SURVEY.md
§2.1 R6-R8, R10): `xla/` is the pure-jnp oracle tier (the correctness
reference, like the reference's MATLAB-ported "Reference" decoder), and
`pallas/` is the native TPU kernel tier (the analog of its Accelerate/CUDA
GPU tier), validated bit-exactly against `xla/`.

Decoders are composed from a schedule (flooding / layered) and a check-node
update rule (spa-tanh / min-sum with normalization alpha or offset beta) the
way the reference's "Model" tier decomposes its decoders (R7).
"""

from .types import DecodeResult
from .api import choose_graph, get_decoder, make_decoder, with_retry

__all__ = [
    "DecodeResult",
    "choose_graph",
    "get_decoder",
    "make_decoder",
    "with_retry",
]
