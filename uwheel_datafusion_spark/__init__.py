"""uwheel_datafusion_spark — a PySpark-native temporal pre-aggregation
analytics engine with the query/data-processing capabilities of the
reference repo ``uwheel/uwheel-datafusion`` (a µWheel-vs-DataFusion
temporal range-aggregation benchmark; see SURVEY.md).

Architecture (Spark-first, not a port):

- Batch ingest of parquet fact tables → DataFrame (vectorized reader,
  predicate pushdown, column pruning handled by Catalyst).
- A **WheelIndex**: multi-granularity (minute/hour/day) pre-aggregated
  rollup tables under event-time watermark semantics, built with plain
  ``groupBy`` aggregations (one shuffle for the minute level; coarser
  levels re-aggregate the finer one, preserving the cascade invariant
  of µWheel's tick/rotate — reference: /root/reference/src/main.rs:140).
- A **driver serving index**: the minute rollup densified into NumPy
  prefix-sum arrays for O(1) ``[start, end)`` range aggregates — the
  honest Spark analogue of µWheel's ``WheelMode::Index`` prefix layout
  (reference: /root/reference/src/main.rs:86-103,212).
- A **range planner** that decomposes ``[start, end)`` into maximal
  aligned day/hour/minute runs with an ``explain()`` plan object
  (reference: explain_combine_range, /root/reference/src/main.rs:214-220).
- A **SQL fallback path**: Spark SQL plays DataFusion's role
  (reference: /root/reference/src/main.rs:237-288).
- Beyond-parity operators for large-scale training-data pipelines:
  dedup (exact / n-gram Jaccard incl. prefix-filtered / MinHash-LSH
  incl. incremental ingest / SimHash / embedding / quality-aware
  canonicalization), similarity search, text analysis (profile /
  langid / chunking / BPE pair counts / PII redaction), corpus
  curation (decontamination / packing / repetition / mixture),
  embedding linear algebra (exact gram matrix / PCA), multimodal
  binary-column plumbing, and data layout (bucketing / z-order /
  compaction) with executed-plan metrics observability.
"""

from uwheel_datafusion_spark.session import get_spark
from uwheel_datafusion_spark.operators.keyed_wheel import KeyedWheelIndex
from uwheel_datafusion_spark.operators.wheel import WheelIndex
from uwheel_datafusion_spark.plans.range_plan import (
    RangePlan,
    decompose_hybrid,
    decompose_range,
)
from uwheel_datafusion_spark.operators.retrieval import RetrievalEngine
from uwheel_datafusion_spark.plans.sql_router import WheelSqlRouter

__all__ = [
    "get_spark",
    "WheelIndex",
    "KeyedWheelIndex",
    "WheelSqlRouter",
    "RetrievalEngine",
    "RangePlan",
    "decompose_range",
    "decompose_hybrid",
]

__version__ = "0.1.0"
