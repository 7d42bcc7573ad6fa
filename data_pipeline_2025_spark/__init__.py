"""data_pipeline_2025_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the query and data-processing
capabilities of the reference repo ShakedZrihen/data-pipeline-2025
(an Israeli supermarket price-comparison pipeline: crawl → ingest →
normalize → query/compare/basket/history/stats), built Spark-first:

- DataFrame/SQL declarative plans (Catalyst optimizes; we broadcast
  small dimensions, keep expressions JVM-side, design partitioning
  for 100 TB scale).
- Structured Streaming replaces the reference's S3→RabbitMQ→Postgres
  relay (SURVEY.md §2.9).
- LLM-training-data operators (dedup, similarity search, text
  analysis, multimodal plumbing) as first-class citizens.

Package map:
  session.py    SparkSession factory with scale-tuned defaults
  catalog.py    testdata table loading / temp-view registration
  registry.py   query registry powering __spark_entry__.queries()
  operators/    relational + domain + dedup/text/similarity operators
  sources/      XML / bronze / silver ingest (batch)
  streaming/    Structured Streaming ingest + windowed aggregation
  functions/    reusable column expression helpers (exact decimal money math)
  tools.py      the reference's 7 MCP-shaped tool entry points
"""

__version__ = "0.1.0"
