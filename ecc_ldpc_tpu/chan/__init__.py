"""Modulation + channel + LLR computation (SURVEY.md §1.3 L2).

BPSK/AWGN (the reference's model, awgn.py) plus the channel-spec registry
(modem.py): hard-decision BPSK, BSC, and Gray square M-QAM with exact
factorized bit LLRs.
"""

from .awgn import (
    awgn_llr,
    make_channel,
    bpsk,
    llr_from_channel,
    noise_sigma,
    q_function,
    uncoded_bpsk_ber,
)
from .modem import (
    bsc_llr,
    build_channel,
    hard_bpsk_awgn_llr,
    parse_channel_spec,
    qam_awgn_llr,
    qam_modulate,
)

__all__ = [
    "awgn_llr",
    "make_channel",
    "bpsk",
    "llr_from_channel",
    "noise_sigma",
    "q_function",
    "uncoded_bpsk_ber",
    "bsc_llr",
    "build_channel",
    "hard_bpsk_awgn_llr",
    "parse_channel_spec",
    "qam_awgn_llr",
    "qam_modulate",
]
