from .text import (  # noqa: F401
    STOP_WORDS,
    normalize_text,
    portable_hash64,
    tokens,
)
