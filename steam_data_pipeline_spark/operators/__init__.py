"""Operator library: generic, composable DataFrame transformations.

Each module maps to a SURVEY.md §2 family:

* ``relational``  — set ops, dedup, limits, top-k, batching (§2.4)
* ``windows``     — ranked listings, latest-per-key, gaps-and-islands,
                    trailing frames (§2.6)
* ``joins``       — star joins, enrichment joins, as-of join, interval
                    overlap join, semi/anti (§2.3)
* ``aggregates``  — counts, capped counts, daily rollups, conditional
                    ROI aggregates, validation profiles (§2.5)
* ``upsert``      — MERGE-style key upsert + append sinks (§2.1 sinks)
* ``state``       — KV state table semantics (§2.1 ``state_kv_rw``)
* ``forecast``    — grouped-map ``applyInPandas`` trend fit (§2.9)
* ``profile``     — data-quality layer: melt profiler, declarative
                    expectations, PSI drift (single + wide-table),
                    MAD anomaly days, snapshot diff (qa_* queries)
* ``graph``       — fixed-point integer PageRank, exact triangle
                    counting / clustering coefficient, k-core peeling
                    (llm_graph_* queries)
* ``recommend``   — seeded implicit-feedback ALS (§2.9)
* ``skew``/``layout``/``asof`` — salting escapes, Z-order storage
                    layout, as-of join variants
"""
