"""metarank_spark — a PySpark-native point-in-time feature-engineering engine.

Re-expresses the semantics of the Metarank event-sourced feature pipeline
(reference: metarank/metarank v0.7.11) as declarative Spark DataFrame plans:

- events are a long table with an explicit total order ``(ts_ms, seq)``
  (reference sorts the stream and asserts ordering,
  flow/CheckOrderingPipe.scala:12-27);
- stateful feature primitives (counter, scalar, periodic counter, bounded
  list, stats, freq, map — model/Feature.scala) become cumulative /
  range window functions over entity-partitioned, time-sorted frames;
- point-in-time snapshots ("zero temporal leakage") become strictly-before
  window frames and as-of joins (flow/MetarankFlow.scala:31-55 ordering
  contract);
- sessionization (flow/TrainBuffer.scala:33-148) becomes lag-gap cumulative
  sums.

Everything stays on the DataFrame API so Catalyst handles pushdown, AQE
handles skew, and whole-stage codegen keeps the hot path JVM-side. The only
Python on the data path is the vectorized Arrow kernel used for semantics
Spark window frames cannot express (anchor-at-last-bucket periodic windows,
exact percentile pools) — see ``metarank_spark.operators.kernel``.
"""

__version__ = "0.1.0"

from metarank_spark.session import get_spark  # noqa: F401
