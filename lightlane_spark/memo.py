"""Session-scoped expression/schema memos — shared eviction helper.

Several modules memoize parsed Columns or inferred schemas keyed by
the live SparkContext's applicationId (immutable expression trees /
metadata, reusable across plans within one session — the
``hyperplane_bits`` precedent). The applicationId key makes a stopped
context's entries unreachable, but nothing deleted them (ADVICE r13):
a long-lived process that cycles sessions (the test suite does)
accumulated stale py4j references. Every memo site calls
:func:`evict_stale` on a memo MISS — a miss under a NEW appId is
exactly the moment a session cycled, and a single process has one
active SparkContext, so any other appId's entries are dead.
"""

from __future__ import annotations


def evict_stale(memo: dict, app_id: str) -> None:
    """Drop ``memo`` entries keyed by an applicationId other than
    ``app_id``. Keys are either the appId itself or tuples whose first
    element is the appId (both conventions exist across the memos)."""
    stale = [
        k for k in memo if (k[0] if isinstance(k, tuple) else k) != app_id
    ]
    for k in stale:
        memo.pop(k, None)
