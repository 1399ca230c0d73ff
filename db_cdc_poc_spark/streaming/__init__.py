"""Structured Streaming layer: file-based streaming sources standing in
for the reference's Kafka topics (reference: 03_Data_Ingestion.py:139-160,
230-251 — no Kafka client in this environment), watermarked stateful
dedup, and the incremental CDC-apply sink.

All jobs here run with ``availableNow`` triggers in tests so results are
deterministic and comparable with their batch equivalents; in production
the same code runs continuously (processingTime triggers) against a
directory that keeps receiving files, or against Kafka when the
connector jar is on the classpath.
"""
