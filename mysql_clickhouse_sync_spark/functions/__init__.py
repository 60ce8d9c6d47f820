"""Column-level function library: the engine's scalar/array functions
(``Column -> Column``), separate from the DataFrame-level operators.

The reference has no scalar function surface at all (SURVEY.md §2.10);
these are the building blocks our operators compose, exposed for users
writing their own queries. All JVM-side built-ins — usable inside any
``select``/``filter`` without leaving whole-stage codegen (the
lambda-based ones run interpreted but stay in the JVM).
"""

from ..operators.dedup import normalize_text, word_shingles
from ..operators.similarity import cosine, dot, hyperplane_signature, norm
from ..operators.text import (
    BPE_PRETOKEN_PATTERN,
    subword_tokens_col,
    tokens_col,
)

__all__ = [
    "BPE_PRETOKEN_PATTERN",
    "cosine",
    "dot",
    "hyperplane_signature",
    "norm",
    "normalize_text",
    "subword_tokens_col",
    "tokens_col",
    "word_shingles",
]
