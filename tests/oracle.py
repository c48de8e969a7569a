"""Pure-Python brute-force oracle — an independent transcription of the
reference's state-fold semantics (fstore/memory/* + FeatureValueFlow +
MetarankFlow ordering), used to property-test the Spark engine on
randomized event streams.

Deliberately naive: a dict-of-state fold over the sorted event list,
snapshotting BEFORE each ranking's own writes (MetarankFlow.scala:31-55)
and committing each event's writes before its own emit
(FeatureValueFlow.scala:29-42)."""

from __future__ import annotations

import math
from collections import defaultdict

NAN = float("nan")


class Oracle:
    def __init__(self, bucket_ms: int = 86_400_000):
        self.bucket_ms = bucket_ms
        self.counters = defaultdict(int)                 # (feat, entity) -> n
        self.periodic = defaultdict(lambda: defaultdict(int))  # (feat, entity) -> {bucket: n}
        self.scalars = {}                                # (feat, entity) -> value

    # --- writes (commit) ---
    def count(self, feat, entity):
        self.counters[(feat, entity)] += 1

    def inc_periodic(self, feat, entity, ts_ms):
        self.periodic[(feat, entity)][ts_ms // self.bucket_ms] += 1

    def put(self, feat, entity, value):
        self.scalars[(feat, entity)] = value

    # --- reads (snapshot) ---
    def read_count(self, feat, entity) -> float:
        # missing → 0.0 (InteractionCountFeature.scala:55-58)
        return float(self.counters.get((feat, entity), 0))

    def read_periodic(self, feat, entity, periods) -> list[float]:
        """Anchor-at-last-bucket window sums (model/Feature.scala:142-161):
        for PeriodRange(p, 0): buckets in [last - p, last] inclusive."""
        m = self.periodic.get((feat, entity))
        if not m:
            return [NAN] * len(periods)
        last = max(m)
        out = []
        for p in periods:
            out.append(float(sum(v for b, v in m.items() if last - p <= b <= last)))
        return out

    def read_rate(self, top, bottom, entity, periods) -> list[float]:
        t = self.read_periodic(top, entity, periods)
        b = self.read_periodic(bottom, entity, periods)
        if any(math.isnan(x) for x in t) or any(math.isnan(x) for x in b):
            return [NAN] * len(periods)
        return [x / y for x, y in zip(t, b)]

    def read_scalar(self, feat, entity) -> float:
        return self.scalars.get((feat, entity), NAN)


def _percentile_linear(sorted_vals: list[float], p: float) -> float:
    """Linear-interpolated percentile (numpy 'linear' / Spark `percentile`
    / Guava Quantiles index interpolation)."""
    n = len(sorted_vals)
    if n == 1:
        return sorted_vals[0]
    idx = p * (n - 1)
    lo = int(idx)
    frac = idx - lo
    if lo + 1 >= n:
        return sorted_vals[-1]
    return sorted_vals[lo] + frac * (sorted_vals[lo + 1] - sorted_vals[lo])


class PoolOracle:
    """Last-N sample pools (stats/freq/bounded-list write-time semantics)."""

    def __init__(self):
        self.samples = defaultdict(list)  # (feat, entity) -> [(ts, seq, v)]

    def add(self, feat, entity, ts, seq, v):
        self.samples[(feat, entity)].append((ts, seq, v))

    def stats(self, feat, entity, pool, pcts) -> list[float]:
        s = self.samples.get((feat, entity))
        if not s:
            return [NAN] * (2 + len(pcts))
        vals = [v for _, _, v in s[-pool:]]
        sv = sorted(vals)
        return [min(vals), max(vals)] + [
            _percentile_linear(sv, p / 100.0) for p in pcts
        ]

    def freq(self, feat, entity, pool) -> dict | None:
        s = self.samples.get((feat, entity))
        if not s:
            return None
        vals = [v for _, _, v in s[-pool:]]
        return {k: vals.count(k) / len(vals) for k in set(vals)}

    def recent(self, feat, entity, count, duration_ms) -> list:
        s = self.samples.get((feat, entity))
        if not s:
            return []
        last_ts = s[-1][0]
        kept = [x for x in s if x[0] >= last_ts - duration_ms][-count:]
        return [v for _, _, v in reversed(kept)]


def fold(events: list[dict], periods=(7,)) -> dict:
    """Replay sorted events; at each ranking take the strictly-before
    snapshot of: clicks counter (item scope), window-count vector (item),
    ctr rate (item), last price scalar (item). Returns
    {(ranking_id, item_id): {...}}."""
    o = Oracle()
    p = PoolOracle()
    snaps = {}
    for e in sorted(events, key=lambda e: (e["ts_ms"], e["seq"])):
        if e["event_type"] == "ranking":
            user = e.get("user_id")
            for it in e["items"]:
                iid = it["id"] if isinstance(it, dict) else it
                snaps[(e["event_id"], iid)] = {
                    "clicks": o.read_count("clicks", iid),
                    "wcnt": o.read_periodic("click_p", iid, periods),
                    "ctr": o.read_rate("click_p", "imp_p", iid, periods),
                    "price": o.read_scalar("price", iid),
                    "st": p.stats("amount", iid, 5, (50,)),
                    "fr": p.freq("kind", iid, 5),
                    "rec": p.recent("visited", user, 3, 86_400_000),
                }
        elif e["event_type"] == "interaction":
            iid = e["item_id"]
            if e["interaction_type"] == "click":
                o.count("clicks", iid)
                o.inc_periodic("click_p", iid, e["ts_ms"])
                p.add("visited", e.get("user_id"), e["ts_ms"], e["seq"], iid)
            elif e["interaction_type"] == "impression":
                o.inc_periodic("imp_p", iid, e["ts_ms"])
            amount = (e.get("num_fields") or {}).get("price")
            if amount is not None:
                p.add("amount", iid, e["ts_ms"], e["seq"], amount)
            kind = ((e.get("str_fields") or {}).get("kind") or [None])[0]
            if kind is not None:
                p.add("kind", iid, e["ts_ms"], e["seq"], kind)
        elif e["event_type"] == "item":
            price = (e.get("num_fields") or {}).get("price")
            if price is not None:
                o.put("price", e["item_id"], price)
    return snaps
