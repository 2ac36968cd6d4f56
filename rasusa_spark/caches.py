"""Scoped release of operator-registered persisted frames (VERDICT r4
Next #9 polish).

Several operators persist intermediate frames whose plans are consumed
more than once (the LSH candidate set, dedup.py:553-557; the threshold
downsampler's joined non-drop set, downsample.py:246). Each registers its
handle in a module registry so callers can unpersist deterministically
(``release_dedup_caches`` / ``release_threshold_caches``). In a
long-lived session (notebook, Thrift server, streaming driver) a caller
that forgets the release leaks executor storage memory run over run.

``cache_scope()`` makes the release structural::

    with cache_scope():
        pairs = minhash_lsh_pairs(docs, verify_exact=True)
        pairs.write.parquet(out)          # materialize INSIDE the scope
    # all frames registered inside the scope are now unpersisted

Releasing is always safe once results are materialized; releasing early
costs a recompute, never correctness (same contract as the underlying
release functions). Scopes may nest: each ``with`` releases everything
registered since it was entered — the registries are stacks, so the
inner scope pops only its own suffix.
"""

from __future__ import annotations

from contextlib import contextmanager

from rasusa_spark.operators import dedup as _dedup
from rasusa_spark.operators import downsample as _downsample


@contextmanager
def cache_scope():
    """Unpersist every dedup/threshold cache registered inside the scope,
    even on error. Frames registered BEFORE entry are left alone (nesting
    works: marks index into the registry stacks)."""
    marks = (len(_dedup._DEDUP_CACHES), len(_downsample._THRESHOLD_CACHES))
    try:
        yield
    finally:
        while len(_dedup._DEDUP_CACHES) > marks[0]:
            _dedup._DEDUP_CACHES.pop().unpersist()
        while len(_downsample._THRESHOLD_CACHES) > marks[1]:
            _downsample._THRESHOLD_CACHES.pop().unpersist()
