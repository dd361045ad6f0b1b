"""Exception surface mirroring the reference's error contract.

Reference: /root/reference/slide/exceptions.py:1-22 defines
SlideException / SlideInvalidOperation / SlideCastError /
SlideIndexIncompatibleError.  The index-compatibility error has no
meaning on Spark (no index), so it is intentionally absent.
"""


class PandasySparkException(Exception):
    """Base exception for the engine."""


class InvalidOperationError(PandasySparkException, ValueError):
    """An operation is invalid (e.g. cross join with keys).

    Parity: SlideInvalidOperation (/root/reference/slide/exceptions.py:7-10).
    """


class CastError(PandasySparkException, ValueError):
    """A cast is impossible for the given types/values.

    Parity: SlideCastError (/root/reference/slide/exceptions.py:13-16).
    Raised eagerly for statically-detectable bad casts; data-dependent
    failures (e.g. inf->int) surface via ``F.raise_error`` in strict mode.
    """
