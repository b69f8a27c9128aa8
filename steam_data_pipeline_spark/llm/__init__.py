"""LLM-training-data operators (SURVEY.md §2.10 north-star extensions).

Designed for the 100 TB regime:

* ``dedup``      — exact hash dedup, MinHash+LSH banding, SimHash,
                   n-gram Jaccard verification, embedding near-dup.
                   All candidate generation is bucket-local (band join),
                   never all-pairs.
* ``simsearch``  — brute-force cosine top-k baseline + IVF-partitioned
                   scale path over ``array<float>`` embeddings.
* ``textstats``  — token counts, language-ID heuristic, quality
                   scoring, document fingerprints; pure JVM expressions.
* ``multimodal`` — opaque binary media columns with typed metadata;
                   decode/feature plumbing via ``mapInPandas`` (real
                   pure-Python PNG/WAV decode, histogram fallback for
                   formats the container can't decode).
* ``lm``         — statistical-LM curation: CCNet bigram fluency
                   scoring, DSIR importance weights (portable
                   Horner-mod feature hash).
* ``pca``        — distributed PCA over embeddings: exact-integer
                   moment sums via per-partition Gramians, bounded
                   driver eigensolve, JVM-side projection.
* ``curation``   — PII scrub, Gopher gates, URL canonicalization,
                   contamination, domain mixing.
* ``sketches``   — mergeable HLL / count-min / bloom / MinHash
                   sketches with in-query error contracts.

Determinism: every hash is ``xxhash64``/``sha2`` with pinned seeds —
never Python ``hash()`` — so results are stable across runs, JVMs and
partitionings.
"""
