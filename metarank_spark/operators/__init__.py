from metarank_spark.operators.extractors import (  # noqa: F401
    bounded_list_string,
    freq_share,
    interaction_count,
    item_age_sec,
    lag_lead,
    last_scalar,
    map_feature_last,
    rate,
    rate_normalized,
    stats_window,
    window_count,
)
from metarank_spark.operators.refresh import refresh_gate  # noqa: F401
