"""Large-scale training-data operators: dedup, similarity, text,
multimodal.  All built from JVM-side built-ins except where Arrow-
batched pandas is the genuinely right tool (media decode)."""

from . import (
    dedup,
    events,
    jpeg,
    multimodal,
    profile,
    sampling,
    similarity,
    text,
)

__all__ = [
    "dedup", "events", "jpeg", "multimodal", "profile", "sampling",
    "similarity", "text",
]
