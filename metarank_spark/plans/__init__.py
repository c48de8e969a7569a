from metarank_spark.plans.asof import asof_join, asof_lookup  # noqa: F401
from metarank_spark.plans.sessionize import sessionize  # noqa: F401
from metarank_spark.plans.windows import (  # noqa: F401
    bucketed_window_count,
    bucketed_window_sum,
    cumulative,
    entity_window,
)
