"""Eager-localCheckpoint handle bookkeeping, centralized.

Several operators materialize an intermediate frame with
``localCheckpoint(eager=True)`` (iterative loops, multiply-consumed
subtrees) and must hand the release obligation to whoever consumes the
final result — loop callers that never release leak block-manager
storage for the life of the session. The handle rides the returned
DataFrame as the ``_eager_checkpoints`` attribute, but a Python
attribute is dropped by ANY intervening transformation (``.select``,
``.filter``, ...), so every producer/combinator must re-attach it
explicitly. Hand-stapling the attribute at each site is exactly the
bug class ADVICE r10 flagged (rrf's ``.select`` silently dropped bm25's
handle): this module is the one idiom every site uses instead.

Usage:
- producers: ``return attach_eager_checkpoints(out, handles=(tf,))``
- combinators / wrapping transformations:
  ``return attach_eager_checkpoints(out, *inputs)`` — inherits every
  handle its inputs carry (plus its own via ``handles=``)
- consumers that loop: ``release_eager_checkpoints(result)`` after the
  result is consumed (single-shot callers can leave the blocks to the
  async ContextCleaner).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def attach_eager_checkpoints(
    out: DataFrame, *sources: DataFrame, handles: tuple = ()
) -> DataFrame:
    """Attach ``handles`` plus every eager-checkpoint handle carried by
    ``sources`` onto ``out`` (as ``out._eager_checkpoints``) and return
    ``out``. The single idiom for propagating release obligations across
    transformations — use this instead of assigning the attribute by
    hand, so no call site can silently drop an inherited handle."""
    # MERGE with anything already on `out` (never overwrite): a caller
    # stacking an extra handle onto a producer's result must not lose the
    # producer's own — the helper existing is no excuse for it to drop
    # handles itself (review r11).
    inherited: tuple = tuple(getattr(out, "_eager_checkpoints", ()))
    inherited += tuple(handles)
    for s in sources:
        inherited += tuple(getattr(s, "_eager_checkpoints", ()))
    if inherited:
        out._eager_checkpoints = inherited
    return out


def release_eager_checkpoints(df: DataFrame) -> None:
    """Deterministically release the eager localCheckpoint blocks an
    operator attached to its result (``_eager_checkpoints``) — call AFTER
    the result is consumed. No-op for frames without the attribute; the
    repo's release discipline for loop callers (bench/service loops),
    mirroring dedup._release_local_checkpoint's contract."""
    from ibis_flink_example_spark.operators.dedup import (
        _release_local_checkpoint,
    )

    for ck in getattr(df, "_eager_checkpoints", ()):  # pragma: no branch
        _release_local_checkpoint(ck)
