"""BPSK modulation + AWGN channel + LLR computation (SURVEY.md §1.3 L2)."""

from .awgn import (
    awgn_llr,
    make_channel,
    bpsk,
    llr_from_channel,
    noise_sigma,
    q_function,
    uncoded_bpsk_ber,
)

__all__ = [
    "awgn_llr",
    "make_channel",
    "bpsk",
    "llr_from_channel",
    "noise_sigma",
    "q_function",
    "uncoded_bpsk_ber",
]
