"""Differential fuzz parity: the driver's Spark-vs-DuckDB compare run
on ADVERSARIAL generated tables instead of the fixed testdata.

The sf0.001/sf0.01 parity sweeps certify the gates on one data
distribution; this harness generates seeded edge-case tables —
timestamp ties, null keys, a mega-conversation, blank/whitespace-only
/punctuation-only documents, duplicate docs, boundary-value lineitems
— and re-runs the same order-insensitive compare for a cross-family
gate sample. Deterministic (``random.Random(seed)``, no wall-clock),
so failures reproduce exactly.
"""

from __future__ import annotations

import random
import sys
from datetime import datetime, timedelta
from pathlib import Path

import pandas as pd
import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "tools"))

GATES = [
    "asof_features", "sessionize", "lag_lead", "turn_labels",
    "entity_labels", "daily_engagement", "mode_tool", "last_role",
    "psi_text_len", "leakage_audit", "token_stats", "text_quality",
    "lang_id", "dedup_exact", "gopher_quality", "zipf_stats",
    "role_transitions", "union_dedup_activity", "k_anonymity",
    "q1_pricing_summary", "q6_forecast_revenue", "dedup_ngram_jaccard",
    "quality_classifier_fit", "streaming_quality_scores",
    "stratified_sample", "session_percentiles",
    "topk_busiest",
    # second ring (r4): drift, calibration, graph, survival, abtest,
    # history, rollups — the families most exposed to ties/degeneracy
    "ks_text_len", "jsd_text_len", "history_lags", "trend_features",
    "hll_weekly_rollup", "pivot_role_counts", "unpivot_role_counts",
    "km_curve", "did_turns", "srm_arms", "calibration_ece",
    "auc_by_fold", "supplier_pagerank", "fingerprint_docs",
    "minhash_signatures", "dedup_canonical", "contrastive_pairs",
    "match_token_distribution", "refusal_rate_weekly", "ewma_daily",
    "repetition_stats", "bigram_pmi", "distinct_ngrams", "duplicate_spans",
    "fairness_by_lang", "multimodal_token_budget",
    # third ring (r5, VERDICT r4 task #1): the families whose tie /
    # zero-cell / censoring / constant-column degeneracies the net had
    # never exercised.
    # causal / A-B: rank ties, zero cells, tiny strata, one-arm weeks
    "mann_whitney", "stratified_ate_conf", "mantel_haenszel_strata",
    "fisher_exact_early_error", "cuped_turns", "ipw_ate", "rdd_turns",
    "bayes_ab", "ab_pvalue", "qte_text_len", "risk_ratio_tools",
    "covariate_balance", "mcnemar_error_shift", "bh_fdr_event_mix",
    "permutation_test_convs", "welch_anova_roles", "kruskal_roles",
    "levene_roles", "yuen_text_len", "mde_text_len", "event_study_weekly",
    # survival: all-censored strata, tied event times, empty risk sets
    "km_greenwood", "cumulative_incidence", "survival_c_index",
    "nelson_aalen", "rmst_14d", "logrank_cohorts", "survival_labels",
    # robust: constant columns, zero MAD, saturated clamps
    "huber_location", "quantile_trend", "mad_outliers", "mad_text_len",
    "winsorize_value", "winsorize_audit", "theil_sen_trend",
    "esd_daily_outliers",
    # graph: disconnected / self-loop / duplicate-edge structures
    "kcore_suppliers", "lsh_modularity", "adamic_adar_trades",
    "hits_suppliers", "cooccurrence_triangles", "dedup_components",
    "dedup_components_star", "markov_stationary",
    # interval algebra / SCD2 / sessions over tied timestamps
    "scd2_role_intervals", "interval_session_join",
    "resample_daily_activity", "peak_concurrency", "cdc_latest_state",
    # time series on sparse / gappy fuzz calendars
    "granger_roles", "stl_daily", "holt_linear", "daily_autocorr",
    "dow_seasonality", "mann_kendall_daily",
    # weights / diagnostics / privacy
    "weight_ess", "skew_diagnosis", "table_checksum", "snapshot_diff",
    "t_closeness", "l_diversity", "benford_prices", "qq_shift_text_len",
    "null_patterns", "json_props_stats", "deletion_cascade",
    "profile_orders",
    # text / tokenization tails not yet fuzzed
    "source_tf_cosine", "prefix_sharing", "sft_pair_quality",
    "negative_samples", "epoch_budget", "cdc_chunks", "winnow_overlap",
    "vocab_oov", "ngram_novelty", "tokenizer_fertility",
    "knn_label_agreement", "pmi_top_factor", "bpe_train_merges",
    "bpe_apply_stats", "quality_classifier_apply",
    # calibration tails
    "hosmer_lemeshow", "temperature_scaling", "conformal_interval",
    "qini_uplift", "label_shift_bbse", "spiegelhalter_cal",
    # streaming outer joins under fuzz corpora
    "streaming_left_join", "streaming_full_join",
    # fourth ring: the nine gates the r5 FULL-registry sweep caught
    # bugs in (window tie-order, NULL policy, zero-norm vectors,
    # blank-text canonicalization, LOF grid) — pinned here so the
    # per-commit net re-exercises every one
    "streaming_closed_sessions", "debounce_events", "woe_tokens",
    "readability", "blocklist_filter", "lof_outliers", "mmr_rerank",
    "neardup_embedding", "lsh_dbscan",
]

WORDS = ["alpha", "beta", "gamma", "delta", "spark", "join", "scan",
         "agg", "window", "shuffle", "token", "quality", "the", "a"]


def _gen_tables(out: Path, seed: int, degenerate: bool = False) -> None:
    r = random.Random(seed)
    base = datetime(2024, 1, 1)

    # events: ties, null keys, a mega user, null-heavy props-free rows.
    # degenerate mode: the zero-cell / all-censored / constant-column
    # shapes the causal, survival and robust families must survive —
    # TWO distinct timestamps total (every rank tied, zero day-gaps),
    # ONE event type (every other contingency cell empty), a CONSTANT
    # value column (zero variance/MAD), 90% one user (single-arm
    # strata, every other conversation a 1-event all-censored case).
    n = 420
    rows = []
    for i in range(n):
        if degenerate:
            user = 9 if r.random() < 0.9 else r.randint(1, 8)
            ts = base + timedelta(hours=r.choice([9, 9, 9, 18]))
            etype, value = "view", 1.5
            props = r.choice(['{"k": 0}', ""])
        else:
            user = 9 if r.random() < 0.4 else r.randint(1, 8)  # mega-conv
            # coarse time grid -> many exact ts ties within and across
            # users
            ts = base + timedelta(
                days=r.randint(0, 27), hours=r.choice([9, 12, 18]),
                minutes=r.choice([0, 15, 30]),
            )
            etype = r.choice(["view", "click", "purchase", "signup", "error"])
            value = r.choice([0.0, 1.5, 1.5, -2.0, 99.9])
            props = r.choice(['{"k": 0}', '{"k": 87}', "", "x y", "  "])
        rows.append((
            i,
            None if r.random() < 0.03 else ts,
            None if r.random() < 0.03 else user,
            etype,
            value,
            props,
        ))
    pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    ).astype({"event_id": "int64", "user_id": "Int64"}).assign(
        ts=lambda d: d["ts"].astype("datetime64[us]")
    ).to_parquet(out / "events.parquet", index=False)

    # documents: blank / whitespace / punctuation-only / dup / 1-word
    # / NULL text / NULL lang — the defensive-projection stress set
    docs = []
    for i in range(64):
        kind = r.random()
        if degenerate:
            # half funneled into the blank/NULL/single-word branches
            # below, the other half exact duplicates from 4 texts
            kind = kind * 0.5 if kind < 0.5 else 1.0
        if degenerate and kind == 1.0:
            text = r.choice(["alpha beta alpha beta", "", "zz yy zz yy", "solo"])
        elif kind < 0.08:
            text = r.choice([
                "", "   ", "\t \n", "!!! ??? ...", "\tfoo bar\n",
                # U+000B vertical tab: Java \s includes it, RE2 \s
                # does not — the engine uses an explicit class so
                # both engines must treat these identically
                "\x0b", "alpha\x0bbeta", "\x0bgamma delta\x0b",
            ])
        elif kind < 0.12:
            text = None
        elif kind < 0.2:
            text = "alpha"  # single word, duplicated across docs
        else:
            text = " ".join(r.choice(WORDS) for _ in range(r.randint(2, 60)))
        lang = None if r.random() < 0.05 else r.choice(
            ["en", "zh", "fr", "es", "de"])
        docs.append((
            i, text, lang,
            f"src{r.randint(0, 4)}", len(text) if text is not None else 0,
        ))
    pd.DataFrame(
        docs, columns=["doc_id", "text", "lang", "source", "n_chars"]
    ).astype({"doc_id": "int64", "n_chars": "int64"}).to_parquet(
        out / "documents.parquet", index=False
    )

    # embeddings: zero vectors + exact duplicates
    import numpy as np

    embs = []
    for i in range(40):
        if degenerate and i % 3 != 0:
            v = [0.0] * 64  # two thirds zero vectors (no direction)
        elif i % 7 == 0:
            v = [0.0] * 64
        elif i % 5 == 0:
            v = [float((j * 3 + 1) % 5) for j in range(64)]  # duplicates
        else:
            v = [round(r.uniform(-1, 1), 3) for _ in range(64)]
        embs.append((i, np.array(v, dtype="float32"), i % 10))
    pd.DataFrame(embs, columns=["vec_id", "embedding", "label"]).astype(
        {"vec_id": "int64", "label": "int32"}
    ).to_parquet(out / "embeddings.parquet", index=False)

    # TPC-H-ish minimal consistent tables; lineitem hits the q6
    # predicate boundaries exactly (discount 0.05/0.07, quantity 24)
    pd.DataFrame(
        [(k, f"R{k}") for k in range(3)], columns=["r_regionkey", "r_name"]
    ).astype({"r_regionkey": "int32"}).to_parquet(out / "region.parquet", index=False)
    pd.DataFrame(
        [(k, f"N{k}", k % 3) for k in range(6)],
        columns=["n_nationkey", "n_name", "n_regionkey"],
    ).astype({"n_nationkey": "int32", "n_regionkey": "int32"}).to_parquet(
        out / "nation.parquet", index=False
    )
    pd.DataFrame(
        [(k, f"C{k}", k % 6, round(r.uniform(-100, 1000), 2), "BUILDING")
         for k in range(12)],
        columns=["c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"],
    ).astype({"c_nationkey": "int32"}).to_parquet(out / "customer.parquet", index=False)
    pd.DataFrame(
        [(k, f"S{k}", k % 6, round(r.uniform(0, 500), 2)) for k in range(8)],
        columns=["s_suppkey", "s_name", "s_nationkey", "s_acctbal"],
    ).astype({"s_nationkey": "int32"}).to_parquet(out / "supplier.parquet", index=False)
    pd.DataFrame(
        [(k, f"P{k}", f"B{k % 3}", f"T{k % 4}", k % 10,
          round(100 + k * 1.5, 2)) for k in range(10)],
        columns=["p_partkey", "p_name", "p_brand", "p_type", "p_size",
                 "p_retailprice"],
    ).astype({"p_size": "int32"}).to_parquet(out / "part.parquet", index=False)
    orders = [
        (k, k % 12, r.choice(["O", "F"]), round(r.uniform(10, 9000), 2),
         base + timedelta(days=r.randint(0, 400)), "1-URGENT")
        for k in range(30)
    ]
    pd.DataFrame(
        orders,
        columns=["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
                 "o_orderdate", "o_orderpriority"],
    ).assign(o_orderdate=lambda d: d["o_orderdate"].astype("datetime64[us]")
    ).to_parquet(out / "orders.parquet", index=False)
    items = []
    for k in range(90):
        items.append((
            k % 30, k % 10, k % 8, k % 4,
            24.0 if degenerate else float(r.choice([1, 23, 24, 25, 50])),
            500.0 if degenerate else round(r.uniform(100, 2000), 2),
            0.05 if degenerate else r.choice([0.04, 0.05, 0.06, 0.07, 0.08]),
            r.choice([0.0, 0.05]),
            r.choice(["A", "N", "R"]), r.choice(["O", "F"]),
            base + timedelta(days=0 if degenerate else r.randint(0, 400)),
        ))
    pd.DataFrame(
        items,
        columns=["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
                 "l_quantity", "l_extendedprice", "l_discount", "l_tax",
                 "l_returnflag", "l_linestatus", "l_shipdate"],
    ).astype({"l_linenumber": "int32"}).assign(
        l_shipdate=lambda d: d["l_shipdate"].astype("datetime64[us]")
    ).to_parquet(out / "lineitem.parquet", index=False)


@pytest.mark.parametrize(
    "seed,degenerate", [(7, False), (1234, False), (99, True)]
)
def test_fuzz_parity_gate_sample(spark, tmp_path, seed, degenerate):
    import duckdb

    import __spark_entry__ as entry
    from parity import TABLES, normalize

    out = tmp_path / f"fuzz{seed}"
    out.mkdir()
    _gen_tables(out, seed, degenerate)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{out}/{t}.parquet'")
    qs, oracles = entry.queries(), entry.oracle_sql()
    failures = []
    for name in GATES:
        sdf = qs[name](spark, str(out)).toPandas()
        odf = con.execute(oracles[name]).fetchdf()
        if len(sdf) != len(odf):
            failures.append(f"{name}: rows {len(sdf)} vs {len(odf)}")
            continue
        if sorted(sdf.columns) != sorted(odf.columns):
            failures.append(f"{name}: columns differ")
            continue
        a, b = normalize(sdf), normalize(odf)
        if not a.equals(b):
            neq = [c for c in a.columns if not a[c].equals(b[c])]
            failures.append(f"{name}: values differ in {neq}")
    assert not failures, failures
