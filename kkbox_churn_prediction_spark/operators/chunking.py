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


# --------------------------------------------------------------------------
# Content-defined chunking (CDC) — block-level dedup, the rsync/LLM-infra
# complement of the document-level shingle dedup family.

_CDC_BASE = 257
_CDC_MOD = 2_147_483_647  # 2^31 − 1 (Mersenne; all mod sums fit BIGINT)


def cdc_chunk_docs(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 16,
    boundary_mask: int = 63,
) -> DataFrame:
    """Split each document into CONTENT-DEFINED chunks: a chunk
    boundary falls after position ``i`` whenever the polynomial
    rolling hash of the trailing ``window`` characters satisfies
    ``h % (boundary_mask+1) == 0`` (expected chunk ≈ mask+1 chars);
    the document end is always a boundary.

    Why content-defined (vs fixed-size): inserting one character into
    a document shifts EVERY fixed-size block after the edit, but only
    the chunks overlapping the edit here — boundaries depend on local
    content alone, so shared substrings between near-duplicate
    documents resolve to byte-identical chunks and dedup at the block
    level (the rsync / CAS-store / training-corpus block-dedup
    property).

    Distributed shape: the rolling hash is computed entirely INSIDE
    the row with higher-order functions — ``transform`` over end
    positions, ``aggregate`` over the ``window`` trailing chars with
    precomputed ``base^j mod M`` literals — so chunking is a narrow
    zero-shuffle projection in whole-stage codegen. No per-row Python,
    no char-level explode (the DuckDB oracle explodes chars; Spark
    never does). The only fan-out is the final chunk ``explode``
    (≈ len/64 rows per doc).

    Output: one row per chunk ``(doc_id, chunk_idx, chunk_len,
    chunk_md5)``. ``chunk_md5`` is the content address — identical
    text ⇒ identical chunk id on any engine.
    """
    w, mask_n = int(window), int(boundary_mask) + 1
    pows = [pow(_CDC_BASE, j, _CDC_MOD) for j in range(w)]
    pow_arr = F.array(*[F.lit(p) for p in pows])
    text = F.col(text_col)
    n = F.length(text)

    # char codes staged as ONE int-array column: hashing w chars per
    # position via string substr costs w·n string slices per doc
    # (measured 43s at sf0.1); via element_at on a precomputed code
    # array it's n slices + w·n long reads (~3s)
    codes = F.when(
        n >= 1,
        F.transform(
            F.sequence(F.lit(1), n),
            lambda i: F.ascii(text.substr(i, F.lit(1))).cast("long"),
        ),
    ).otherwise(F.array().cast("array<long>"))
    carr = F.col("_codes")

    def _hash_at(i):
        return (
            F.aggregate(
                F.sequence(F.lit(0), F.lit(w - 1)),
                F.lit(0).cast("long"),
                lambda acc, j: acc
                + F.element_at(carr, (i - j).cast("int"))
                * F.element_at(pow_arr, j + 1),
            )
            % F.lit(_CDC_MOD)
        )

    # STAGE 1: the char-code array as a real column (see above).
    with_codes = docs.select(
        F.col(id_col).alias("doc_id"), text.alias("_t"), codes.alias("_codes")
    )
    n2 = F.size(F.col("_codes"))
    # boundary END positions (1-based): content boundaries ++ doc end.
    # sequence(w, n) DESCENDS when n < w — guard short docs to an
    # empty boundary list (they become one whole-doc chunk).
    bound_pos = F.when(
        n2 >= w,
        F.filter(
            F.transform(
                F.sequence(F.lit(w), n2),
                lambda i: F.when(_hash_at(i) % mask_n == 0, i.cast("long")),
            ),
            lambda x: x.isNotNull(),
        ),
    ).otherwise(F.array().cast("array<long>"))
    # STAGE 2: the bounds array as a real column — ``bounds`` is
    # referenced three times below (twice in ``starts``, once in the
    # zip) and HOF expressions are interpreted + re-inlined per
    # reference; leaving it inline re-ran the whole O(w·n) hash
    # transform per reference (measured 140s at sf0.1; staging the
    # bounds AND the code array brings the gate to ~3s)
    staged = with_codes.select(
        "doc_id",
        "_t",
        F.array_distinct(
            F.concat(bound_pos, F.array(n2.cast("long")))
        ).alias("_bounds"),
    )
    bounds = F.col("_bounds")
    starts = F.concat(
        F.array(F.lit(0).cast("long")),
        F.slice(bounds, 1, F.greatest(F.size(bounds) - 1, F.lit(0))),
    )
    chunks = F.filter(
        F.zip_with(
            starts,
            bounds,
            lambda s, e: F.struct(
                s.alias("s"), (e - s).alias("len")
            ),
        ),
        lambda p: p["len"] > 0,
    )
    return (
        staged.select(
            "doc_id",
            F.col("_t"),
            F.posexplode(chunks).alias("chunk_idx", "_c"),
        )
        .select(
            "doc_id",
            F.col("chunk_idx").cast("int").alias("chunk_idx"),
            F.col("_c.len").cast("long").alias("chunk_len"),
            F.md5(
                F.col("_t").substr(
                    (F.col("_c.s") + 1).cast("int"), F.col("_c.len").cast("int")
                )
            ).alias("chunk_md5"),
        )
    )


def cdc_dedup_stats(chunks: DataFrame) -> DataFrame:
    """Per-document block-level dedup rollup over a
    :func:`cdc_chunk_docs` table: how many of the doc's chunks (and
    bytes) also appear elsewhere in the corpus, and the corpus-wide
    storage ratio those shared blocks imply.

    ``shared`` means the chunk's content hash occurs ≥ 2 times in the
    corpus (in other docs OR repeated within this one). One hash agg
    builds the chunk-frequency table keyed by content address; one
    broadcast-or-shuffle join flags each chunk — never all-pairs, and
    the frequency table is at most corpus-bytes/expected-chunk-size
    rows (the same discipline as the shingle-cap join).

    Output per doc: ``(doc_id, n_chunks, n_shared_chunks,
    chunk_bytes, shared_bytes, dup_byte_ratio)``.
    """
    freq = chunks.groupBy("chunk_md5").agg(
        F.count(F.lit(1)).alias("_f")
    )
    flagged = chunks.join(freq, "chunk_md5").select(
        "doc_id",
        "chunk_len",
        (F.col("_f") >= 2).cast("int").alias("_shared"),
    )
    return flagged.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_chunks"),
        F.sum("_shared").cast("long").alias("n_shared_chunks"),
        F.sum("chunk_len").cast("long").alias("chunk_bytes"),
        F.sum(F.col("chunk_len") * F.col("_shared")).cast("long").alias("shared_bytes"),
        F.round(
            F.sum(F.col("chunk_len") * F.col("_shared")).cast("double")
            / F.sum("chunk_len").cast("double"),
            6,
        ).alias("dup_byte_ratio"),
    )
