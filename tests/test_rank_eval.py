"""rank_eval semantics golden — NDCG@10 / MRR hand-computed with ltrlib
conventions (gain 2^rel - 1, log2(pos+1) discount, nolabels -> 1.0),
independent of the DuckDB mirror."""

from __future__ import annotations

import math
import os

import pandas as pd


def test_rank_eval_hand_computed(spark, tmp_path):
    import __spark_entry__ as em

    # user 1: scores rank events A(5.0,click) B(4.0,view) C(3.0,click):
    #   ranked order A,B,C -> rel 1,0,1; dcg = 1/log2(2) + 1/log2(4) = 1.5
    #   ideal 1,1,0 -> idcg = 1 + 1/log2(3); mrr = 1/1
    # user 2: no clicks -> ndcg = 1.0 (nolabels), mrr = 0
    # user 3: first click at rank 2 -> mrr = 0.5
    rows = [
        (1, "2024-01-01 00:00:00", 1, "click", 5.0, None),
        (2, "2024-01-01 00:00:01", 1, "view", 4.0, None),
        (3, "2024-01-01 00:00:02", 1, "click", 3.0, None),
        (4, "2024-01-01 00:00:03", 2, "view", 9.0, None),
        (5, "2024-01-01 00:00:04", 2, "view", 8.0, None),
        (6, "2024-01-01 00:00:05", 3, "view", 2.0, None),
        (7, "2024-01-01 00:00:06", 3, "click", 1.0, None),
    ]
    df = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    df["ts"] = pd.to_datetime(df["ts"])
    sf = str(tmp_path)
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(
        pa.Table.from_pandas(df),
        os.path.join(sf, "events.parquet"),
        coerce_timestamps="us",
    )

    got = {
        r["user_id"]: (r["n_items"], r["ndcg10"], r["mrr"])
        for r in em.queries()["rank_eval"](spark, sf).collect()
    }
    dcg1 = 1 / math.log2(2) + 1 / math.log2(4)
    idcg1 = 1 / math.log2(2) + 1 / math.log2(3)
    assert got[1] == (3, round(dcg1 / idcg1, 6), 1.0)
    assert got[2] == (2, 1.0, 0.0)
    assert got[3] == (2, round((1 / math.log2(3)) / 1.0, 6), 0.5)
