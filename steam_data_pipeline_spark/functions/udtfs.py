"""Python UDTFs (Spark 4 ``@udtf`` — real user-defined TABLE functions
executed via LATERAL join, not grouped-map stand-ins).

Worker note: classes here are cloudpickled BY REFERENCE to this
module; ``session.ship_package`` makes the package importable on
Python workers regardless of the host process cwd.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf

CHUNK_SIZE = 16
CHUNK_STRIDE = 8


@udtf(returnType="chunk_idx int, chunk string, n_tokens int")
class ChunkText:
    """Overlapping token-window chunker — the RAG/embedding-prep shape:
    emit ``CHUNK_SIZE``-token windows every ``CHUNK_STRIDE`` tokens,
    stopping once a window reaches the end of the document (no
    trailing all-overlap chunk). One input row fans out to
    ceil-ish(n/stride) rows; per-row state only, so the UDTF
    parallelizes per partition with no shuffle of its own."""

    def eval(self, text):
        toks = (text or "").split()
        n = len(toks)
        idx, s = 0, 0
        while True:
            c = toks[s : s + CHUNK_SIZE]
            if c:
                yield idx, " ".join(c), len(c)
            if s + CHUNK_SIZE >= n:
                break
            s += CHUNK_STRIDE
            idx += 1
