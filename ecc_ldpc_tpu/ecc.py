"""The ECC facade: encode / transmit / decode as one object.

The reference's central abstraction is the `ECC` record — name, encode,
decode, message/codeword lengths, rate — with implementations registered
under string names (SURVEY.md §2.1 R1). This module is that record for the
new framework: one object tying a code, its encoder, a channel honoring its
puncture/shorten structure, and a decoder, resolved from the same compact
spec strings the CLI uses.

    ecc = build_ecc("dvbs2/64800/12", "layered/norm:0.8125/25")
    cw   = ecc.encode(msg)                     # [B, k] -> [B, n]
    llr  = ecc.transmit(key, cw, ebn0_db=1.2)  # BPSK + AWGN + LLR
    out  = ecc.decode(llr)                     # DecodeResult
    m2   = ecc.extract_message(out.bits)
"""
from __future__ import annotations

import dataclasses
from typing import Callable

from .chan.modem import build_channel
from .codes import get_code
from .codes.spec import CodeSpec
from .decode import get_decoder
from .encode.structured import build_encoder


@dataclasses.dataclass
class ECC:
    name: str
    spec: CodeSpec
    encoder: object
    decoder: Callable
    channel: Callable

    @property
    def k(self) -> int:
        return self.spec.k

    @property
    def n(self) -> int:
        return self.spec.n

    @property
    def rate(self) -> float:
        return self.spec.rate

    def encode(self, msg_bits):
        return self.encoder(msg_bits)

    def transmit(self, key, codeword_bits, ebn0_db):
        return self.channel(key, codeword_bits, ebn0_db)

    def decode(self, llr):
        return self.decoder(llr)

    def extract_message(self, codeword_bits):
        return self.encoder.extract_message(codeword_bits)


def build_ecc(code: str, decoder: str = "minsum/norm:0.8125/25",
              backend: str | None = None, channel: str = "bpsk") -> ECC:
    spec = get_code(code)
    from .decode.api import choose_graph

    graph = choose_graph(spec, decoder, backend=backend)
    overrides = {"backend": backend} if backend else {}
    return ECC(
        name=f"{code}|{decoder}",
        spec=spec,
        encoder=build_encoder(spec),
        decoder=get_decoder(graph, decoder, **overrides),
        channel=build_channel(spec, channel),
    )
