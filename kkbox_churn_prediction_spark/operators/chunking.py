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
    impl: str = "arrow",
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

    Two result-identical implementations (same exact integer hash,
    same chunk addresses — equality is pytest-asserted):

    - ``impl="arrow"`` (default): partition-preserving ``mapInPandas``;
      per Arrow batch the rolling hash is ``window`` shifted
      multiply-adds on a numpy int64 code-point array (products
      < 2^52, sums < 2^56 — exact). This is the scale path: the
      JVM higher-order-function path below is INTERPRETED expression
      evaluation (HOF lambdas never enter whole-stage codegen), and
      the vectorized rewrite measured 7.7× faster on the sf0.1 corpus
      (9.4s → 1.2s best-of, single partition — per-core throughput).
    - ``impl="sql"``: pure JVM higher-order functions (``transform``
      over end positions, ``aggregate`` over the trailing window with
      precomputed ``base^j mod M`` literals) — zero Python, useful
      where an Arrow channel is unavailable.

    Both are narrow zero-shuffle projections; the only fan-out is the
    final chunk explode (≈ len/64 rows per doc). No char-level explode
    (the DuckDB oracle explodes chars; Spark never does).

    Output: one row per chunk ``(doc_id, chunk_idx, chunk_len,
    chunk_md5)``. ``chunk_md5`` is the content address — identical
    text ⇒ identical chunk id on any engine.
    """
    if impl == "arrow":
        return _cdc_chunk_docs_arrow(
            docs,
            text_col=text_col,
            id_col=id_col,
            window=int(window),
            boundary_mask=int(boundary_mask),
        )
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


def _cdc_chunk_docs_arrow(
    docs: DataFrame,
    *,
    text_col: str,
    id_col: str,
    window: int,
    boundary_mask: int,
) -> DataFrame:
    """Vectorized CDC chunker (see :func:`cdc_chunk_docs`): one
    partition-preserving ``mapInPandas`` pass, zero shuffles. Per
    document the code-point array comes from the UTF-32 encoding (so
    indexing matches Spark's character-based ``substr``), the rolling
    hash is ``window`` shifted int64 multiply-adds, boundaries are one
    ``flatnonzero``, and each chunk is content-addressed with md5 over
    its UTF-8 bytes — bit-identical to ``F.md5`` on the substring."""
    from pyspark.sql import types as T

    w, mask_n = int(window), int(boundary_mask) + 1
    mod = _CDC_MOD
    pows = [pow(_CDC_BASE, j, mod) for j in range(w)]

    id_field = docs.schema[id_col]
    out_schema = T.StructType(
        [
            T.StructField("doc_id", id_field.dataType),
            T.StructField("chunk_idx", T.IntegerType()),
            T.StructField("chunk_len", T.LongType()),
            T.StructField("chunk_md5", T.StringType()),
        ]
    )

    def chunk_batches(batches):
        import hashlib

        import numpy as np
        import pandas as pd

        pw = np.array(pows, dtype=np.int64)
        for pdf in batches:
            ids, idxs, lens, md5s = [], [], [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["_t"]):
                if text is None:
                    continue
                codes = np.frombuffer(
                    text.encode("utf-32-le"), dtype="<u4"
                ).astype(np.int64)
                n = codes.size
                if n == 0:
                    continue
                if n >= w:
                    h = np.zeros(n - w + 1, dtype=np.int64)
                    for j in range(w):
                        h += codes[w - 1 - j : n - j] * pw[j]
                    h %= mod
                    # 1-based END positions of boundary windows
                    ends = np.flatnonzero(h % mask_n == 0) + w
                else:
                    ends = np.empty(0, dtype=np.int64)
                bounds = np.unique(np.append(ends, n))
                starts = np.concatenate(([0], bounds[:-1]))
                ci = 0
                for s, e in zip(starts, bounds):
                    if e <= s:
                        continue
                    piece = text[int(s) : int(e)]
                    ids.append(doc_id)
                    idxs.append(ci)
                    lens.append(int(e - s))
                    md5s.append(
                        hashlib.md5(piece.encode("utf-8")).hexdigest()
                    )
                    ci += 1
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype=pdf["doc_id"].dtype),
                    "chunk_idx": pd.Series(idxs, dtype="int32"),
                    "chunk_len": pd.Series(lens, dtype="int64"),
                    "chunk_md5": pd.Series(md5s, dtype="object"),
                }
            )

    staged = docs.select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("_t")
    )
    return staged.mapInPandas(chunk_batches, schema=out_schema)


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
