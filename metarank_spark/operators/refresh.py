"""Refresh gate for batch feature-value emission.

The reference suppresses snapshot emission between writes of the same
feature key until ``refresh`` has elapsed (flow/FeatureValueFlow.scala:64-80
shouldRefresh: first write emits and anchors; later writes emit only when
enough event time passed — FeatureValueFlowTest.scala:36-49 pins three
same-ts writes to a single emission). The streaming twin implements the
same gate inside its stateful ops (streaming/pipeline.py refresh_ms); this
module is the batch-side equivalent for a write-value series headed to a
FeatureValueSink.

Anchor semantics: we advance the anchor to the last *emitted* write
(matching the streaming twin). The reference never re-puts its scaffeine
cache entry, so its anchor is the first-seen ts until the entry is evicted
(expireAfterAccess(1.hour), maximumSize 20000, weakValues — i.e. lossy by
construction, FeatureValueFlow.scala:109); under its own unit test the two
definitions coincide. Last-emit anchoring is the deterministic,
cache-size-independent reading of the contract — a documented deviation
like the ImpressionInject ordering note.

Plan shape: one hash shuffle on the feature key, Arrow batches per group,
a numpy scan inside — emission gating is a data-dependent chain (each
keep decision depends on the previous kept ts), which no fixed window
frame expresses, so this is a legitimate applyInPandas use (same class as
the streaming state ops). Groups are single feature keys: bounded and
skew-free.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame


def refresh_gate(
    writes: DataFrame,
    entity: str | list[str],
    refresh_ms: int,
    ts: str = "ts_ms",
    seq: str = "seq",
) -> DataFrame:
    """Filter a write-value series to gated emissions per entity/feature
    key: the first write always emits; a later write emits iff
    ``ts - last_emitted_ts >= refresh_ms``. refresh_ms <= 0 emits every
    write (the reference's test default)."""
    if refresh_ms <= 0:
        return writes
    keys = [entity] if isinstance(entity, str) else list(entity)

    def gate(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([ts, seq], kind="mergesort")
        tvals = pdf[ts].values.astype(np.int64)
        keep = np.zeros(len(tvals), dtype=bool)
        last = None
        for i, t in enumerate(tvals):
            if last is None or t - last >= refresh_ms:
                keep[i] = True
                last = t
        return pdf[keep]

    return writes.groupBy(*keys).applyInPandas(gate, schema=writes.schema)
