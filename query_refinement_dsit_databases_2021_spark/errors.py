"""Engine error types.

The reference aborts the process on invalid input via ``earlyDeath``
(reference:src/client.py:296-303) and on a flat data segment
(reference:src/server.py:209-214). A library must not ``quit(1)``, so
every such path raises a typed exception instead.
"""


class QueryError(ValueError):
    """Invalid query text or query spec (parser / validation failures)."""


class DataVariabilityError(QueryError):
    """Selected series segment has (near-)zero variance.

    Mirrors reference:src/server.py:209-214 (``var(y) <= 5e-28`` aborts).
    """


class ScratchSpaceError(RuntimeError):
    """Pre-dispatch estimate says the sparse path's candidate shuffle
    would spill more than the free local scratch space.

    Raised by the W→S strategy path BEFORE the job runs, instead of
    letting a multi-minute shuffle die ``No space left on device``
    mid-flight (the measured failure mode of the 194M-candidate run:
    46 GB of spill against 25 GB free)."""
