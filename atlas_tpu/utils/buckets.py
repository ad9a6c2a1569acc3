"""Shared length-bucket ladder for host-side padding decisions.

XLA compiles one executable per input shape, so host code that would pad
"longest" per batch (free under torch — reference atlas.py:26-39, :70-76)
rounds up to a small ladder of lengths instead: a handful of compiled shapes,
padded work proportional to real lengths. One ladder for every consumer (the
refresh embed slabs in index/refresh.py and batch tokenization in
core/atlas.py) so the set of compiled shapes stays maintained in one place.
"""

LENGTH_BUCKETS = (16, 32, 64, 96, 128, 192, 256, 384, 512)


def pick_bucket(longest: int, cap: int) -> int:
    """Smallest ladder rung >= longest that is <= cap; cap itself otherwise."""
    for b in LENGTH_BUCKETS:
        if b >= longest and b <= cap:
            return b
    return cap
