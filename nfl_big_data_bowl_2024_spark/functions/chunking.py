"""Document chunking as a Python user-defined table function (UDTF).

Overlapping token-window chunking (size 64, stride 48) is the standard
RAG / training-data shape: each document explodes into per-chunk rows a
downstream embedder or packer consumes. The per-chunk ROW EMISSION is what
needs a table function — one input row yields a variable number of output
rows with derived columns — and Spark 4's ``@udtf`` is the engine's
extension point for exactly that: a lateral table function usable from SQL
(``..., LATERAL token_chunks(text)``), Arrow-batched (``useArrow=True``,
plans as ``ArrowEvalPythonUDTF`` — never row-at-a-time pickling).

Chunk rule (mirrored literally by the DuckDB oracle via
``generate_series(0, len(t)-1, stride)``): starts are ``0, stride,
2*stride, ...`` while ``start < n_tokens``; each chunk covers tokens
``[start, min(start+size, n))``. Tokens are ``text.split(' ')`` — the
empty-preserving split every token-count oracle in this engine uses.

The UDTF is map-only: chunking shuffles nothing, and at 100 TB it scales
with input splits exactly like any other projection. The Python boundary
is the documented cost (Arrow batches amortize it); a pure-JVM alternative
for counting-only workloads is ``doc_pack_context_windows``'s
sequence()-based layout, which this module deliberately does NOT replace —
here the chunk CONTENT (first/last token) crosses into each output row,
which sequence() cannot emit without re-slicing the text per chunk.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf

CHUNK_SIZE = 64
CHUNK_STRIDE = 48


@udtf(
    returnType="chunk_idx int, n_toks int, first_tok string, last_tok string",
    useArrow=True,
)
class TokenChunks:
    """Explode one document into overlapping token-window chunk rows."""

    def eval(self, text: str):
        if text is None:
            return
        toks = text.split(" ")
        n = len(toks)
        idx = 0
        for start in range(0, n, CHUNK_STRIDE):
            end = min(start + CHUNK_SIZE, n)
            yield idx, end - start, toks[start], toks[end - 1]
            idx += 1


def register_token_chunks(spark) -> str:
    """Register the chunker as the SQL table function ``token_chunks``.

    Registration is idempotent (re-registering overwrites); returns the
    function name for use in a LATERAL clause.
    """
    spark.udtf.register("token_chunks", TokenChunks)
    return "token_chunks"
