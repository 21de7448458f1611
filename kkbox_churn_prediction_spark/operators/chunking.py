"""Fixed-token-window document chunking with overlap (stride).

The complement of :mod:`packing` — packing fills fixed context bins
with many SHORT documents; chunking splits one LONG document into
overlapping ``chunk_size``-token windows every ``stride`` tokens, the
standard preprocessing step before tokenized training or embedding
models with a hard context limit. The reference has no direct analog
(its windows are temporal, e.g. ``features/features_comprehensive.sql:97-144``),
but its multi-horizon "same data, several window carves" pattern is
the same shape: one scan, all windows derived arithmetically.

Distributed shape: chunk boundaries are pure integer arithmetic on a
per-document token count, so the whole operator is one narrow
``sequence``+``explode`` projection — NO shuffle, NO UDF, NO window.
Fan-out per row is ``1 + ceil(max(n_tokens - chunk_size, 0) /
stride)``, bounded by document length; at 100 TB the explode runs
inside the scan stage and Catalyst keeps it in whole-stage codegen.
Chunks are (doc_id, chunk_idx)-addressed, so any downstream slice of
the original text (substr on a token-offset index) stays deterministic
under repartitioning and resume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_documents(
    df: DataFrame,
    token_col: str,
    chunk_size: int,
    stride: int,
    *,
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, chunk_idx, chunk_start, chunk_end, chunk_tokens):
    one row per ``chunk_size``-token window starting every ``stride``
    tokens. The last chunk is truncated at ``n_tokens`` (never padded,
    never dropped — the tail is always covered). A document shorter
    than ``chunk_size`` (including empty) yields exactly one chunk.

    ``stride < chunk_size`` gives overlapping windows (overlap =
    ``chunk_size - stride``); ``stride == chunk_size`` is disjoint
    tiling. Offsets are token indices — the caller slices text/ids by
    them — so the operator never touches the text column and the scan
    prunes to (id, token-count) only.
    """
    if stride <= 0 or chunk_size <= 0:
        raise ValueError("chunk_size and stride must be positive")
    c, s = int(chunk_size), int(stride)
    tok = F.col(token_col).cast("bigint")
    # integer ceil-div (`div`), float-free for cross-engine hash parity
    n_chunks = F.lit(1).cast("bigint") + F.expr(
        f"(greatest(cast({token_col} as bigint) - {c}, 0L) + {s - 1}) div {s}"
    )
    exploded = df.select(
        F.col(id_col),
        tok.alias("n_tokens"),
        F.explode(
            F.sequence(F.lit(0).cast("bigint"), n_chunks - F.lit(1).cast("bigint"))
        ).alias("chunk_idx"),
    )
    start = F.col("chunk_idx") * F.lit(s)
    end = F.least(start + F.lit(c), F.col("n_tokens"))
    return exploded.select(
        id_col,
        "chunk_idx",
        start.alias("chunk_start"),
        end.alias("chunk_end"),
        (end - start).alias("chunk_tokens"),
    )
