"""Pure-jnp oracle decoders (the correctness tier; SURVEY.md §2.2 C12-C14)."""

from .cn_ops import cn_minsum, cn_spa, get_cn_op
from .flooding import decode_flooding

__all__ = ["cn_minsum", "cn_spa", "get_cn_op", "decode_flooding"]
