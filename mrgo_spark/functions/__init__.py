from .text import ascii_tokens, unicode_tokens, ws_tokens
from .vectors import cosine_sim, dot, l2_norm, lit_doubles, lit_longs

__all__ = [
    "ascii_tokens",
    "unicode_tokens",
    "ws_tokens",
    "cosine_sim",
    "dot",
    "l2_norm",
    "lit_doubles",
    "lit_longs",
]
