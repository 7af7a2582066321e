"""instructionspipe-spark: a PySpark-native analytics & data-processing engine.

A from-scratch Spark design with the query and data-processing capabilities of
the reference "Instructions-MapReduce" pipeline (innerNULL/instructionspipe,
studied read-only at /root/reference — see SURVEY.md):

- config-driven instruction map/reduce pipelines compiled to DataFrame plans
  (``plans/``), whose only bespoke physical operator is an async, cached,
  retrying LLM kernel (``mapInPandas``) with a deterministic MockLlm for tests;
- the full relational/ETL surface (scope projection, semantic-null filtering,
  grouping, exact + MinHash-LSH near-dedup, per-group capped sampling,
  leak-free grouped splits, judge-metric aggregation) as idiomatic Spark SQL
  (``operators/``, ``functions/``);
- large-scale training-data-pipeline operators: dedup family, similarity
  search over embeddings, multimodal column plumbing, text analysis;
- Structured Streaming ingest with watermarked dedup and event-time windows
  (``streaming/``).

Everything is designed for 100 TB scale: declarative plans (Catalyst prunes,
pushes down and picks join strategies), broadcast for small dims, map-side
partial aggregation, deterministic hash-based shuffles/sampling (no RNG state),
and no driver-side collect loops in any data path.
"""

__version__ = "0.1.0"

from instructionspipe_spark.session import (  # noqa: F401
    broadcast_if_small,
    ensure_parallelism,
    get_spark,
    persist_scope,
    release_persisted,
)
from instructionspipe_spark.catalog import load_tables, register_views  # noqa: F401
