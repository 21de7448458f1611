"""Multimodal columns: opaque binary payloads + typed metadata.

Image/audio/video are ``binary`` columns with a metadata struct; the
Spark-side plumbing (schema, partition-preserving mapInPandas, Arrow
batch shapes, deterministic output schema) is real and tested. The
actual codec work is STUBBED — the decode libraries (PIL/ffmpeg/…)
are not in this container — behind ``decode_fn`` hooks:

- default hook = deterministic fake decoder (hash-derived
  "dimensions", so tests have goldens);
- ``strict=True`` raises NotImplementedError, marking exactly where a
  real codec plugs in.

Pattern: ``mapInPandas`` over an iterator of Arrow batches — per
BATCH vectorized work (never per row), output schema declared up
front so Catalyst can prune through it.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),  # opaque bytes
        T.StructField("mime", T.StringType(), True),
        T.StructField("source_doc_id", T.LongType(), True),
    ]
)

FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes long, width int, height int, "
    "n_frames int, fingerprint long"
)


def _fake_decode(payload: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in for a codec: derives (width, height,
    n_frames) from the payload bytes. Replace with PIL/ffmpeg."""
    if payload is None:
        return (0, 0, 0)
    h = int.from_bytes(payload[:8].ljust(8, b"\0"), "big")
    return (64 + h % 1024, 64 + (h >> 10) % 1024, 1 + (h >> 20) % 300)


def attach_media(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Test harness: synthesize a binary payload column from text
    (UTF-8 bytes) so the plumbing runs on the existing documents
    table without external data.

    NULL text coalesces to ``''`` BEFORE encoding — matching the
    DuckDB oracle's ``COALESCE(text, '')``, so a NULL-text document
    yields an empty (not NULL) payload and the 64×64×1 fake-decode
    dims on both engines. Gate precondition: the oracle derives byte
    values via ``ascii(substr(...))``, which equals UTF-8 bytes only
    for ASCII text — the synthetic documents are printable ASCII by
    construction (non-ASCII payloads exercise the Spark side only)."""
    return docs.select(
        F.col(id_col).alias("media_id"),
        F.lit("image").alias("kind"),
        F.encode(F.coalesce(F.col(text_col), F.lit("")), "UTF-8")
        .cast("binary")
        .alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        F.col(id_col).alias("source_doc_id"),
    )


def extract_media_features(
    media: DataFrame,
    decode_fn: Callable[[bytes], tuple[int, int, int]] | None = None,
    *,
    strict: bool = False,
) -> DataFrame:
    """Batch feature extraction over binary payloads.

    Arrow batches flow through ``mapInPandas``; each batch is handled
    with pandas/numpy vector ops + one tight loop over the payload
    objects (unavoidable: codecs take one buffer at a time — the loop
    is per batch element over already-materialized bytes, not a
    row-at-a-time UDF round trip).
    """
    if strict:
        raise NotImplementedError(
            "real media decode requires codec libraries not present in "
            "this environment; pass decode_fn or use the deterministic fake"
        )
    decode = decode_fn or _fake_decode

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            dims = [decode(p) for p in pdf["payload"]]
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                    "n_frames": [d[2] for d in dims],
                    "fingerprint": [
                        int.from_bytes(p[:6].ljust(6, b"\0"), "big") if p else 0
                        for p in pdf["payload"]
                    ],
                }
            )
            yield out

    return media.mapInPandas(batches, schema=FEATURE_SCHEMA)


def resize_plan(
    media: DataFrame,
    target_w: int = 256,
    target_h: int = 144,
    decode_fn: Callable[[bytes], tuple[int, int, int]] | None = None,
) -> DataFrame:
    """Image/video resize plumbing: letterbox geometry on top of the
    (stubbed) decode.

    Fit each source inside ``(target_w, target_h)`` preserving aspect
    ratio, with centered padding. The geometry is INTEGER-exact (no
    float scale factors), so it cross-checks bit-for-bit against any
    engine, and it runs JVM-side — the only Python step is the Arrow
    decode batch. The pixel resample itself is the stubbed codec
    step: a real implementation consumes ``(payload, out_w, out_h)``
    in the same ``mapInPandas`` pass as decode, one buffer per batch
    element.

    Degenerate media (zero-dim decode, i.e. NULL payload) emits all
    zeros rather than a full-pad frame.
    """
    tw, th = int(target_w), int(target_h)
    feats = extract_media_features(media, decode_fn)
    ok = (F.col("width") > 0) & (F.col("height") > 0)
    # source aspect at least as wide as the target's -> width binds
    wide = F.col("width") * th >= F.col("height") * tw
    out_w = (
        F.when(~ok, F.lit(0))
        .when(wide, F.lit(tw))
        .otherwise(
            F.greatest(F.lit(1), F.expr(f"CAST(width AS BIGINT) * {th} div height"))
        )
        .cast("int")
    )
    out_h = (
        F.when(~ok, F.lit(0))
        .when(wide, F.greatest(F.lit(1), F.expr(f"CAST(height AS BIGINT) * {tw} div width")))
        .otherwise(F.lit(th))
        .cast("int")
    )
    geo = feats.select(
        "media_id",
        "kind",
        F.col("width").alias("src_w"),
        F.col("height").alias("src_h"),
        out_w.alias("out_w"),
        out_h.alias("out_h"),
    )
    pad_x = F.when(F.col("out_w") <= 0, F.lit(0)).otherwise(
        F.expr(f"({tw} - out_w) div 2")
    )
    pad_y = F.when(F.col("out_h") <= 0, F.lit(0)).otherwise(
        F.expr(f"({th} - out_h) div 2")
    )
    return geo.select(
        "media_id",
        "kind",
        "src_w",
        "src_h",
        "out_w",
        "out_h",
        pad_x.cast("int").alias("pad_x"),
        pad_y.cast("int").alias("pad_y"),
    )


def media_token_cost(
    media: DataFrame,
    *,
    patch: int = 14,
    every_n: int = 30,
    target_w: int = 256,
    target_h: int = 144,
    decode_fn: Callable[[bytes], tuple[int, int, int]] | None = None,
) -> DataFrame:
    """Per-media token-cost estimation at the documented resize
    geometry — what a multimodal training-data pipeline budgets
    sequence length with BEFORE decoding a single pixel.

    Cost model (ViT-style, documented so the numbers are auditable):
    the letterboxed output (:func:`resize_plan` geometry, integer
    exact) is cut into ``patch``×``patch`` tiles —
    ``tiles_x·tiles_y`` patch tokens plus one row-break token per
    tile row — giving ``tokens_per_frame``. Images charge one frame;
    videos charge every sampled frame at the
    :func:`frame_sample_plan` cadence (frames 0, n, 2n, … →
    ``(n_frames−1) div every_n + 1`` samples); other kinds charge 0.
    ``media_tokens = tokens_per_frame · n_sampled``.

    Everything after the (stubbed, Arrow-batched) decode is INTEGER
    column algebra — exact cross-engine, hence oracle-checkable with
    plain SQL. One decode pass: geometry and frame counts ride the
    same :func:`extract_media_features` output; no second
    mapInPandas.
    """
    tw, th, p = int(target_w), int(target_h), int(patch)
    feats = extract_media_features(media, decode_fn)
    ok = (F.col("width") > 0) & (F.col("height") > 0)
    wide = F.col("width") * th >= F.col("height") * tw
    out_w = (
        F.when(~ok, F.lit(0))
        .when(wide, F.lit(tw))
        .otherwise(
            F.greatest(F.lit(1), F.expr(f"CAST(width AS BIGINT) * {th} div height"))
        )
        .cast("int")
    )
    out_h = (
        F.when(~ok, F.lit(0))
        .when(wide, F.greatest(F.lit(1), F.expr(f"CAST(height AS BIGINT) * {tw} div width")))
        .otherwise(F.lit(th))
        .cast("int")
    )
    geo = feats.select(
        "media_id", "kind", "n_frames", out_w.alias("out_w"), out_h.alias("out_h")
    )
    tiles_x = F.expr(f"(out_w + {p - 1}) div {p}").cast("int")
    tiles_y = F.expr(f"(out_h + {p - 1}) div {p}").cast("int")
    tpf = (tiles_x.cast("bigint") * tiles_y + tiles_y).cast("bigint")
    n_sampled = (
        F.when(F.col("kind") == "image", F.lit(1))
        .when(
            F.col("kind") == "video",
            F.expr(
                f"(greatest(n_frames - 1, 0) div {int(every_n)})"
            ).cast("int")
            + F.lit(1),
        )
        .otherwise(F.lit(0))
        .cast("int")
    )
    return geo.select(
        "media_id",
        "kind",
        "out_w",
        "out_h",
        F.col("n_frames").cast("int").alias("n_frames"),
        n_sampled.alias("n_sampled"),
        tiles_x.alias("tiles_x"),
        tiles_y.alias("tiles_y"),
        tpf.alias("tokens_per_frame"),
        (tpf * n_sampled.cast("bigint")).cast("bigint").alias("media_tokens"),
    )


def multimodal_token_budget(
    docs: DataFrame,
    media_costs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    media_doc_col: str = "media_id",
    chunk_budget: int = 2048,
) -> DataFrame:
    """Interleaved text+media assembly budgeting: per document, the
    whitespace text tokens plus the summed :func:`media_token_cost`
    of its attached media, and how many fixed-budget context chunks
    the assembled document spans (``ceil(total / chunk_budget)``) —
    the multimodal extension of ``pack_documents``' text-only
    accounting. Output: ``(doc_id, text_tokens, media_tokens,
    total_tokens, n_chunks)``.

    Shape: media costs collapse to one row per document (hash agg on
    the media→doc key), then ONE join onto the document stream;
    integer algebra after. Documents with no media charge 0.
    """
    from kkbox_churn_prediction_spark.operators.textstats import token_count

    per_doc = media_costs.groupBy(
        F.col(media_doc_col).alias("_mdoc")
    ).agg(F.sum("media_tokens").cast("bigint").alias("_media_tokens"))
    base = docs.select(
        F.col(id_col),
        token_count(F.coalesce(F.col(text_col), F.lit(""))).alias("text_tokens"),
    )
    j = base.join(per_doc, base[id_col] == per_doc["_mdoc"], "left")
    media_tok = F.coalesce(F.col("_media_tokens"), F.lit(0).cast("bigint"))
    total = (F.col("text_tokens") + media_tok).cast("bigint")
    b = int(chunk_budget)
    return j.select(
        F.col(id_col),
        "text_tokens",
        media_tok.alias("media_tokens"),
        total.alias("total_tokens"),
        F.expr(f"CAST((text_tokens + coalesce(_media_tokens, 0) + {b - 1}) "
               f"div {b} AS INT)").alias("n_chunks"),
    )


def frame_sample_plan(media: DataFrame, every_n: int = 30) -> DataFrame:
    """Video frame-sampling plumbing: expand (media_id, frame_no)
    rows for frames 0, n, 2n, … of each video's n_frames — the
    decode of each sampled frame is the stubbed step. Pure explode,
    no Python."""
    feats = extract_media_features(media)
    return feats.where(F.col("kind").isin("video", "image")).select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.col("n_frames") - 1, F.lit(0)), F.lit(every_n))
        ).alias("frame_no"),
    )
