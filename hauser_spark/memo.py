"""Bounded session memos for localCheckpoint'd shared sub-frames.

Several operator families (graph, curation, CDC, exact-ranker) share an
expensive sub-frame across queries through a module-level dict keyed by
``(applicationId, sf_dir)`` holding a ``localCheckpoint`` DataFrame.
Checkpoint blocks are deliberately immune to ``catalog.clearCache()``
(that is the point of the memo — bench harnesses clear the catalog
between queries), which also means an unbounded memo in a long-lived
session iterating many sf_dirs accumulates checkpoint storage that is
never released (ADVICE r6).

``memo_put`` bounds every memo: entries from other applications are
dropped eagerly (their executors, and therefore their checkpoint
blocks, are already gone — the stale refs only pin Python/py4j
objects), and within the live application at most ``MEMO_MAX_ENTRIES``
sf_dirs are retained FIFO.  Eviction drops the last Python reference,
which releases the JVM-side RDD through the py4j finalizer and lets
Spark's ContextCleaner reclaim the checkpoint blocks.
"""

from __future__ import annotations

MEMO_MAX_ENTRIES = 4


def memo_put(memo: dict, key: tuple[str, str], value) -> None:
    """Insert ``value`` under ``key``, evicting cross-application and
    over-cap entries (FIFO by insertion order)."""
    app = key[0]
    for stale in [k for k in memo if k[0] != app]:
        memo.pop(stale, None)
    while len(memo) >= MEMO_MAX_ENTRIES:
        memo.pop(next(iter(memo)))
    memo[key] = value
