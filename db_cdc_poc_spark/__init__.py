"""db_cdc_poc_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and data-processing
capabilities of the reference CDC proof-of-concept (btison/db-cdc-poc):
medallion CSV/Kafka-style ingestion, streaming dedup, CDC apply (upsert by
key with sequencing + deletes), dimensional joins, and the current-inventory
gold aggregate — plus the large-scale training-data-pipeline operators a
100 TB deployment needs (exact/fuzzy dedup, similarity search, text
analysis, multimodal column plumbing).

Design principles (see ARCHITECTURE.md):
- DataFrame/SQL only; Catalyst plans everything. No RDDs.
- Aggregate-with-partial (groupBy + max_by) over window functions where a
  map-side combine exists — minimizes shuffle bytes at scale.
- Broadcast small dims, let AQE handle skew, push filters to the scan.
- Python stays on the driver for orchestration; executor-side Python only
  as Arrow-batched pandas UDFs where JVM expressions genuinely can't
  express the semantics.
"""

__version__ = "0.1.0"
