"""RankLens end-to-end: the reference's OWN shipped config
(src/test/resources/ranklens/config.yml — all 21 features) loaded by our
YAML loader and run through the engine, replaying the exact rerank
scenario of e2e/RanklensTest.scala:50-103 (ranking `event1` with its 24
real item ids at ts 1636993838000, clicks on 102880/109487/8644).

The reference's recorded event log
(ranklens/events/events.jsonl.gz) is a git-lfs POINTER in this sandbox —
the 4 MB payload is not present — so the event stream here is a
deterministic reconstruction in the canonical schema: item metadata
upserts shaped like the movielens payload the config expects, then the
verbatim RanklensTest ranking + interactions. Feature goldens are
hand-computed from the reference semantics (zero leakage at same-ts,
strictly-before counts, metadata reads, index encode, position).
"""

from __future__ import annotations

import math
import os

import pytest

from metarank_spark.config import load_config
from metarank_spark.engine import FeatureEngine
from metarank_spark.events import events_df, interaction_event, item_event, ranking_event
from metarank_spark.operators.clickthrough import training_matrix

CONFIG = "/root/reference/src/test/resources/ranklens/config.yml"

# e2e/RanklensTest.scala:56-80 — the verbatim 24-item ranking
RANK_ITEMS = [
    "96610", "8371", "4975", "7163", "111759", "102880", "109487", "95309",
    "115713", "122882", "134130", "8644", "49278", "2916", "2012", "68358",
    "132046", "2709", "79357", "5903", "107406", "1210", "85056", "1270",
]
TS = 1_636_993_838_000  # RanklensTest.scala:53
CLICKED = ["102880", "109487", "8644"]  # :85-95


def _movielens_item(item, seq, *, popularity, vote_avg, title, genres, tags):
    return item_event(
        item, TS - 86_400_000, seq,
        str_fields={
            "title": [title], "genres": genres, "tags": tags,
            "actors": [f"actor_{item}"], "director": [f"dir_{item}"],
        },
        num_fields={
            "popularity": popularity, "vote_avg": vote_avg,
            "vote_cnt": 100.0, "budget": 1e6, "release_date": 2000.0,
            "runtime": 120.0,
        },
    )


def _stream():
    rows = [
        _movielens_item("96610", 1, popularity=50.0, vote_avg=7.5,
                        title="Edge of Tomorrow", genres=["action", "science fiction"],
                        tags=["time travel"]),
        _movielens_item("102880", 2, popularity=30.0, vote_avg=5.9,
                        title="After Earth", genres=["action"], tags=["space"]),
        _movielens_item("109487", 3, popularity=80.0, vote_avg=8.1,
                        title="Interstellar", genres=["science fiction", "drama"],
                        tags=["space", "time travel"]),
        _movielens_item("8644", 4, popularity=40.0, vote_avg=6.9,
                        title="I Robot", genres=["action", "science fiction"],
                        tags=["robots"]),
        _movielens_item("1270", 5, popularity=60.0, vote_avg=8.0,
                        title="Back to the Future", genres=["comedy", "science fiction"],
                        tags=["time travel"]),
    ]
    rows.append(ranking_event("event1", RANK_ITEMS, TS, 10, user="u1", session="s1"))
    # RanklensTest: three clicks at the SAME timestamp as the ranking
    for i, item in enumerate(CLICKED):
        rows.append(interaction_event(
            item, "click", TS, 11 + i, user="u1", session="s1",
            ranking="event1", id=f"event{2 + i}",
        ))
    # the reranked request after the clicks (resp2 of :97-102) — same
    # items, same user, later commit position
    rows.append(ranking_event("event5", RANK_ITEMS, TS + 60_000, 20,
                              user="u1", session="s1"))
    return rows


@pytest.fixture(scope="module")
def matrix(spark):
    if not os.path.exists(CONFIG):
        pytest.skip("reference checkout not present")
    cfg = load_config(CONFIG)
    engine = FeatureEngine(cfg.features, **cfg.engine_kwargs())
    tm = training_matrix(events_df(spark, _stream()), engine)
    rows = {(r["ranking_id"], r["item_id"]): r.asDict() for r in tm.collect()}
    return cfg, rows


def test_config_features_all_materialize(matrix):
    """Every feature of the shipped config — including every column the
    xgboost model declares — lands in the training matrix."""
    cfg, rows = matrix
    cols = set(next(iter(rows.values())))
    for f in cfg.features:
        assert f.name in cols, f"feature {f.name} missing from matrix"
    for feat in cfg.models["xgboost"]["features"]:
        assert feat in cols, f"model feature {feat} missing"
    assert len(rows) == 2 * len(RANK_ITEMS)


def test_labels_from_clicks(matrix):
    """ClickthroughQuery labels: the three clicked items of event1 get
    1.0, everything else 0.0; event5 had no interactions."""
    _, rows = matrix
    for item in RANK_ITEMS:
        assert rows[("event1", item)]["label"] == (1.0 if item in CLICKED else 0.0)
        assert rows[("event5", item)]["label"] == 0.0


def test_zero_leakage_at_same_timestamp(matrix):
    """RanklensTest ordering contract (same-ts clicks must NOT leak into
    event1's snapshot — the strictly-before read): every count feature
    is 0 at event1 even though the clicks share its timestamp."""
    _, rows = matrix
    for item in CLICKED:
        r = rows[("event1", item)]
        assert r["global_item_click_count"] == 0.0  # missing count = 0.0
        assert r["visitor_click_count"] == 0.0
        # missing periodic state = NaN-vector (MValue.scala:56-61), NOT
        # zeros — state simply does not exist before the first write
        assert all(math.isnan(x) for x in r["day_item_click_count"])


def test_counts_visible_at_second_ranking(matrix):
    """The reranked request (event5) sees the three clicks — the
    resp1 != resp2 assertion of RanklensTest:101-102, pinned exactly:
    per-item click count 1, session click count 3, 7/30-day windows 1."""
    _, rows = matrix
    for item in CLICKED:
        r = rows[("event5", item)]
        assert r["global_item_click_count"] == 1.0
        assert r["visitor_click_count"] == 3.0
        assert r["day_item_click_count"] == [1.0, 1.0]
    # and the feature vectors genuinely differ between the two requests
    assert any(
        rows[("event1", i)]["global_item_click_count"]
        != rows[("event5", i)]["global_item_click_count"]
        for i in RANK_ITEMS
    )


def test_metadata_features_read_back(matrix):
    """number / word_count / string features reproduce the item payload:
    popularity and vote_avg as-of, title word count, genre index encode
    (1-based position in the config's values list; head of the list)."""
    _, rows = matrix
    r = rows[("event1", "109487")]
    assert r["popularity"] == 80.0
    assert r["vote_avg"] == 8.1
    assert r["title_length"] == 1.0  # "Interstellar"
    # genres head = "science fiction" → 8th entry of the values list
    assert r["genre"] == 8.0
    r2 = rows[("event1", "102880")]
    assert r2["title_length"] == 2.0  # "After Earth"
    assert r2["genre"] == 4.0  # action
    # items with no metadata read missing (NaN)
    assert math.isnan(rows[("event1", "8371")]["popularity"])


def test_position_feature_training_mode(matrix):
    """position (PositionFeature training mode) = the item's index in
    the ranking, not the configured constant."""
    _, rows = matrix
    assert rows[("event1", "96610")]["position"] == 0.0
    assert rows[("event1", "102880")]["position"] == 5.0
    assert rows[("event5", "1270")]["position"] == 23.0


def test_diversity_numeric_golden(matrix):
    """divers_popularity (DiversityFeature numeric :118-130): candidate
    popularity minus the median over the ranking's top-10 items' values.
    Known values in the top 10: 50, 30, 80 → median 50; 109487 → 30."""
    _, rows = matrix
    assert rows[("event1", "109487")]["divers_popularity"] == pytest.approx(30.0)
    assert rows[("event1", "102880")]["divers_popularity"] == pytest.approx(-20.0)
