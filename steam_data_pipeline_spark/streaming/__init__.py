"""Structured-Streaming ingest path (SURVEY.md §2.8).

``ingest`` re-expresses the reference's scheduled micro-batch pipeline
(runner.py + main.py:378-495) as a Structured Streaming program:
file-source micro-batches → dedup → enrichment → ``foreachBatch``
upsert/append sinks, with checkpoint-as-lock semantics.
"""
