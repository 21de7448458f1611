"""Text analysis for training-data pipelines: language-ID, quality
scoring, token counting, document fingerprinting.

All pure column expressions (the north-star bans per-row Python);
each has a DuckDB oracle in ``__spark_entry__``. The reference's
closest analog is its derived-measure projections
(``features/features_comprehensive.sql:182-223`` listening-ratio
stats); the operators here are their text-corpus counterparts.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kkbox_churn_prediction_spark.functions.text import (
    all_word_ngrams,
    normalize_text,
    stable_hash48,
    tokens,
    word_shingles,
)

# tiny per-language stopword profiles for the n-gram/stopword-ratio
# heuristic (language ID by evidence ratio, argmax with name tiebreak)
LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is"),
    "de": ("der", "die", "das", "und", "ist", "ein"),
    "es": ("el", "la", "de", "que", "y", "es", "un"),
    "fr": ("le", "la", "de", "et", "est", "un", "une"),
}


def token_count(col: Column) -> Column:
    """whitespace token count (0 for blank)."""
    return F.size(tokens(col)).cast("bigint")


def bpe_ish_token_count(col: Column) -> Column:
    """BPE-ish proxy: count of word-piece units — alpha runs split
    every 4 chars + digit runs + punctuation singletons. A regex
    count, not a real BPE, but monotone with subword vocab size."""
    pieces = F.regexp_extract_all(
        normalize_text(col), F.lit(r"[a-z]{1,4}|[0-9]+|[^a-z0-9 \t\n\x0B\f\r]"), 0
    )
    return F.size(pieces).cast("bigint")


def stopword_hits(col: Column, words: tuple[str, ...]) -> Column:
    toks = tokens(normalize_text(col))
    arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(toks, lambda t: F.array_contains(arr, t))).cast("bigint")


def lang_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Predicted language = argmax stopword-evidence ratio (ties →
    lexicographically first language; 'und' = undetermined when no
    evidence). Staged: tokens evaluate once, scores once, argmax over
    score COLUMNS (see the staged-construction note below)."""
    scored = df.select(
        id_col, *doc_signal_stage1(F.col(text_col), quality=False)
    ).select(id_col, *doc_signal_stage2(quality=False))
    pred = lang_pred_from_scores()
    return scored.select(
        id_col, *[f"score_{lang}" for lang in LANG_PROFILES], pred.alias("pred_lang")
    )


# --- staged per-doc signal construction ------------------------------------
# One naive projection that inlines every signal re-evaluates the
# heavy subtrees (normalize, tokenize, regex strips) once per
# REFERENCE — the quality composite alone references them ~10× and
# measured 266s for 7.9M docs where the staged form runs the same
# math in ~25s. Catalyst's CollapseProject deliberately preserves a
# projection boundary when a non-cheap alias is referenced more than
# once downstream, so expressing the pipeline as stage1 (heavy raw
# intermediates, each aliased once) → stage2 (ratios/scores from
# stage-1 COLUMNS) → stage3 (flags/argmax from stage-2 COLUMNS)
# guarantees single evaluation without any caching.


# the 32 ASCII punctuation chars: codes 33-47, 58-64, 91-96, 123-126
# — exactly the [!-/:-@\[-`{-~] ranges the oracle's regex keeps
_PUNCT_CHARS = "".join(
    chr(c)
    for c in (*range(33, 48), *range(58, 65), *range(91, 97), *range(123, 127))
)


def doc_signal_stage1(t: Column, *, quality: bool = True) -> list[Column]:
    """Heavy per-doc intermediates, each evaluated exactly once;
    ``quality=False`` skips the quality-only strips.

    Punct count via ``translate`` (char-map, no regex): Java's regex
    engine is ~40× slower on the NEGATED class ``[^!-/:-@\\[-`{-~]``
    (it matches nearly every char, rebuilding the string match by
    match — measured 19.5s vs 0.4s per 800k docs). n_chars minus the
    punct-stripped length counts exactly the same 32 ASCII chars the
    oracle's regex keeps, for ASCII and non-ASCII text alike."""
    norm = normalize_text(t)
    cols = [F.size(tokens(t)).cast("bigint").alias("n_tokens")]
    if quality:
        n_chars = F.length(t)
        cols += [
            n_chars.cast("bigint").alias("n_chars_calc"),
            F.length(F.regexp_replace(norm, " ", "")).alias("_nospace_len"),
            (n_chars - F.length(F.translate(t, _PUNCT_CHARS, ""))).alias(
                "_punct_len"
            ),
        ]
    cols.append(tokens(norm).alias("_norm_toks"))
    return cols


def doc_signal_stage2(*, quality: bool = True) -> list[Column]:
    """Ratios + per-language scores from stage-1 columns. stopword
    ratio ≡ score_en (same expression, two aliases downstream)."""
    ntok = F.greatest(F.col("n_tokens"), F.lit(1))
    cols = []
    if quality:
        cols += [
            F.round(F.col("_nospace_len") / ntok, 6).alias("mean_word_len"),
            F.round(
                F.col("_punct_len") / F.greatest(F.col("n_chars_calc"), F.lit(1)), 6
            ).alias("punct_ratio"),
        ]
    for lang, ws in LANG_PROFILES.items():
        arr = F.array(*[F.lit(w) for w in ws])
        hits = F.size(
            F.filter(F.col("_norm_toks"), lambda x: F.array_contains(arr, x))
        ).cast("bigint")
        cols.append(F.round(hits / ntok, 6).alias(f"score_{lang}"))
    return cols


def quality_output_cols() -> list[Column]:
    """Flags + composite from stage-2 columns (cheap comparisons)."""
    length_ok = F.when(
        (F.col("n_tokens") >= 10) & (F.col("n_tokens") <= 100000), 1.0
    ).otherwise(0.0)
    punct_ok = F.when(F.col("punct_ratio") <= 0.2, 1.0).otherwise(0.0)
    word_len_ok = F.when(
        (F.col("mean_word_len") >= 2) & (F.col("mean_word_len") <= 12), 1.0
    ).otherwise(0.0)
    return [
        F.col("n_chars_calc"),
        F.col("n_tokens"),
        F.col("mean_word_len"),
        F.col("punct_ratio"),
        F.col("score_en").alias("stopword_ratio"),
        F.round((length_ok + punct_ok + word_len_ok) / 3.0, 6).alias("quality_score"),
    ]


def lang_pred_from_scores() -> Column:
    """Argmax over the score_<lang> columns (rounded scores,
    sorted-name tiebreak, 'und' when no evidence)."""
    best_score = None
    best = None
    for lang in sorted(LANG_PROFILES):
        s = F.col(f"score_{lang}")
        if best is None:
            best_score, best = s, F.lit(lang)
        else:
            best = F.when(s > best_score, F.lit(lang)).otherwise(best)
            best_score = F.greatest(best_score, s)
    return F.when(best_score > 0, best).otherwise(F.lit("und"))


def quality_features(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Length / punctuation / stopword / word-shape quality signals +
    a composite [0,1] score (each signal clamped then averaged)."""
    return (
        df.select(id_col, *doc_signal_stage1(F.col(text_col)))
        .select(id_col, "n_chars_calc", "n_tokens", *doc_signal_stage2())
        .select(id_col, *quality_output_cols())
    )


def tfidf_top_terms(
    df: DataFrame,
    k: int = 3,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_df_table: bool = True,
) -> DataFrame:
    """Top-k characteristic terms per document by TF-IDF:
    (doc_id, term, tf, df, tfidf, rank). Deterministic tiebreak
    (score desc, term asc); idf = ln((1+N)/(1+df)) + 1 (the
    smooth-idf convention, never negative/zero).

    Corpus-statistics shape: term frequencies reduce on (doc, term)
    with map-side partials; document frequencies reduce the SAME
    stream again on term alone (algebraic count — hot stopwords are
    heavy keys but never buffer); the per-term df table (vocab-sized,
    ≪ corpus) broadcasts back onto the tf stream — no shuffle of the
    big side for the join; the corpus doc count rides a one-row
    broadcast cross join, not a driver collect. Final top-k is a
    per-doc window bounded by document length. At 10^12 docs the only
    exchanges are the two aggs. ``broadcast_df_table=True`` (default)
    FORCES the broadcast — right while the vocab is executor-memory
    sized; pass False for open-vocabulary corpora where it isn't, and
    the join shuffles on term with AQE skew splitting for hot
    stopwords.
    """
    from pyspark.sql import Window

    toks = df.select(
        F.col(id_col), F.explode(tokens(normalize_text(F.col(text_col)))).alias("term")
    )
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = df.select(F.count(F.lit(1)).alias("_N"))
    df_side = F.broadcast(dfreq) if broadcast_df_table else dfreq
    scored = (
        tf.join(df_side, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.round(
                F.col("tf")
                * (F.log((F.lit(1.0) + F.col("_N")) / (F.lit(1.0) + F.col("df"))) + 1.0),
                6,
            ),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.col("tfidf").desc(), F.col("term").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= int(k))
        .select(id_col, "term", "tf", "df", "tfidf", F.col("rank").cast("int").alias("rank"))
    )


def bm25_scores(
    df: DataFrame,
    query_terms: tuple[str, ...],
    k: int = 20,
    *,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Okapi BM25 relevance of each document to a bag-of-terms query →
    top-k ``(doc_id, n_terms_hit, dl, bm25, rank)``.

    idf is the Robertson/Lucene positive variant
    ``ln((N - df + 0.5)/(df + 0.5) + 1)``; N and avgdl are over
    non-empty documents (empty text produces no tokens and can never
    score). Deterministic tiebreak (score desc, doc_id asc).

    Scale shape — join-free two-pass conditional aggregation (the A2
    multi-horizon trick applied to retrieval): because the query is a
    small static term list, per-term tf becomes |q| conditional
    ``sum(when(term = t))`` columns of ONE doc-keyed hash agg (map-side
    partials, one shuffle, dl rides the same pass), per-term df + N +
    avgdl become ONE single-row agg over that result (broadcast back
    via cross join), and the score is a pure per-row expression. No
    vocab join, no dl join, no explode survives the first exchange. At
    10^12 docs the only data-sized exchange is the per-doc agg — and it
    runs ONCE: the stats branch shares the same exchange subtree, which
    AQE's exchange reuse dedupes at runtime (verified: one
    ReusedExchange in the adaptive plan). The final top-k is
    TakeOrderedAndProject (never a global sort); rank is assigned on
    the k collected rows only.
    """
    terms = list(dict.fromkeys(query_terms))
    toks = df.select(
        F.col(id_col), F.explode(tokens(normalize_text(F.col(text_col)))).alias("term")
    )
    per_doc = toks.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("dl"),
        *[
            F.sum(F.when(F.col("term") == t, 1).otherwise(0)).alias(f"_tf_{i}")
            for i, t in enumerate(terms)
        ],
    )
    stats = per_doc.agg(
        F.count(F.lit(1)).alias("_N"),
        F.avg("dl").alias("_avgdl"),
        *[
            F.sum(F.when(F.col(f"_tf_{i}") > 0, 1).otherwise(0)).alias(f"_df_{i}")
            for i in range(len(terms))
        ],
    )
    contribs = []
    hits = []
    for i in range(len(terms)):
        tf = F.col(f"_tf_{i}")
        dfq = F.col(f"_df_{i}")
        idf = F.log((F.col("_N") - dfq + 0.5) / (dfq + 0.5) + 1.0)
        norm = tf + k1 * (1.0 - b + b * (F.col("dl") / F.col("_avgdl")))
        contribs.append(F.when(tf > 0, idf * ((tf * (k1 + 1.0)) / norm)).otherwise(F.lit(0.0)))
        hits.append(F.when(tf > 0, 1).otherwise(0))
    score = contribs[0]
    for c in contribs[1:]:
        score = score + c
    n_hit = hits[0]
    for h in hits[1:]:
        n_hit = n_hit + h
    scored = (
        per_doc.crossJoin(F.broadcast(stats))
        .select(
            F.col(id_col),
            n_hit.cast("int").alias("n_terms_hit"),
            F.col("dl"),
            F.round(score, 6).alias("bm25"),
        )
        .where(F.col("n_terms_hit") > 0)
        .orderBy(F.col("bm25").desc(), F.col(id_col).asc())
        .limit(int(k))
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.col("bm25").desc(), F.col(id_col).asc())
    return scored.withColumn("rank", F.row_number().over(w).cast("int"))


def vocab_coverage(
    df: DataFrame,
    vocab_size: int = 32,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Tokenizer-prep vocabulary audit: build the top-``vocab_size``
    corpus vocabulary by frequency (tiebreak count desc, term asc)
    and report per-document coverage →
    ``(doc_id, n_tokens, n_in_vocab, oov_rate)``.

    This is the sizing loop a BPE/unigram tokenizer build runs before
    committing a vocab: how much of each document the candidate vocab
    explains, and where OOV concentrates.

    Scale shape: term counts reduce with map-side partials (one
    term-keyed exchange, hot stopwords are heavy keys but algebraic);
    the vocab itself is top-k over the vocab-sized count table
    (TakeOrderedAndProject, never a global sort) and is
    executor-memory tiny by construction, so it broadcasts back onto
    the token stream — the per-doc coverage agg is then ONE doc-keyed
    exchange. No join shuffles the corpus side.
    """
    toks = df.select(
        F.col(id_col), F.explode(tokens(normalize_text(F.col(text_col)))).alias("term")
    )
    counts = toks.groupBy("term").agg(F.count(F.lit(1)).alias("cnt"))
    vocab = (
        counts.orderBy(F.col("cnt").desc(), F.col("term").asc())
        .limit(int(vocab_size))
        .select("term", F.lit(1).alias("_in_vocab"))
    )
    return (
        toks.join(F.broadcast(vocab), "term", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.coalesce(F.col("_in_vocab"), F.lit(0))).alias("n_in_vocab"),
        )
        .select(
            id_col,
            "n_tokens",
            "n_in_vocab",
            F.round(
                (F.col("n_tokens") - F.col("n_in_vocab")) / F.col("n_tokens"), 6
            ).alias("oov_rate"),
        )
    )


def fingerprint(df: DataFrame, text_col: str = "text", n: int = 5, id_col: str = "doc_id") -> DataFrame:
    """Document fingerprint: min 48-bit hash over word n-grams (the
    winnowing/rolling-hash idea reduced to its min-sketch: equal for
    near-identical texts, cheap to compare). Whole-doc hash included
    for exact-dup detection."""
    sh = word_shingles(normalize_text(F.col(text_col)), n)
    min_sh = F.array_min(F.transform(sh, lambda s: stable_hash48(s)))
    return df.select(
        id_col,
        stable_hash48(normalize_text(F.col(text_col))).alias("doc_hash48"),
        F.coalesce(min_sh, F.lit(-1)).alias("min_shingle_hash48"),
    )


def unigram_logprob_score(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_vocab: bool = True,
) -> DataFrame:
    """Corpus-LM quality proxy: (doc_id, n_scored_tokens,
    avg_token_logprob) where each token scores ln(count(token)/T)
    against the corpus's own unigram distribution — the cheap stand-in
    for perplexity filtering (gibberish and boilerplate-free text
    scores low; natural high-frequency prose scores high).

    Two passes, same shape as :func:`tfidf_top_terms`: the unigram
    table reduces from one exploded token stream (map-side partials),
    the corpus total rides a one-row broadcast, and the vocab-sized
    frequency table broadcasts back onto the token stream
    (``broadcast_vocab=False`` switches to a shuffle join for
    open-vocabulary corpora). Per-doc reduce is algebraic.
    """
    toks = df.select(
        F.col(id_col), F.explode(tokens(normalize_text(F.col(text_col)))).alias("term")
    )
    vocab = toks.groupBy("term").agg(F.count(F.lit(1)).alias("c"))
    total = vocab.agg(F.sum("c").alias("_T"))
    vocab_side = F.broadcast(vocab) if broadcast_vocab else vocab
    scored = (
        toks.join(vocab_side, "term")
        .crossJoin(F.broadcast(total))
        .select(id_col, F.log(F.col("c").cast("double") / F.col("_T")).alias("_lp"))
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_scored_tokens"),
        F.round(F.avg("_lp"), 6).alias("avg_token_logprob"),
    )


def repetition_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Repetition / boilerplate curation signals per document — the
    Gopher/C4 family of filters (duplicated-word fraction, top-word
    dominance, unigram entropy, duplicated-bigram fraction). High
    repetition marks templated or degenerate text that LLM curation
    drops; the reference's nearest analog is its ratio-style quality
    measures over listening logs (``features/features_comprehensive.sql:182-223``).

    Output per doc (every input doc kept; empty text → zeros):
    ``n_words``, ``dup_word_frac`` (1 − distinct/total),
    ``top_word_frac`` (mode count / total), ``word_entropy``
    (Shannon, bits), ``n_bigrams``, ``dup_bigram_frac``.

    Distributed shape: two explode→two-level hash aggregations keyed
    by (doc, gram) then (doc) — all algebraic (sum/count/max/sum of
    c·log2 c), so map-side partials absorb the explode fan-out before
    either shuffle; entropy comes from the identity
    −Σp·log2 p = log2 n − (Σ c·log2 c)/n so no second pass over counts.
    The final assembly is two doc-keyed joins on aggregation outputs
    (co-partitioned, AQE-cheap). No UDF, no window, no driver loop.
    """
    t = F.col(text_col)
    words = df.select(id_col, F.explode(tokens(t)).alias("_w"))
    wc = words.groupBy(id_col, "_w").agg(F.count(F.lit(1)).alias("_c"))
    wstats = wc.groupBy(id_col).agg(
        F.sum("_c").alias("_n"),
        F.count(F.lit(1)).alias("_nd"),
        F.max("_c").alias("_top"),
        F.sum(F.col("_c").cast("double") * F.log2(F.col("_c").cast("double"))).alias("_clog"),
    )
    bigrams = df.select(id_col, F.explode(all_word_ngrams(t, 2)).alias("_g"))
    bc = bigrams.groupBy(id_col, "_g").agg(F.count(F.lit(1)).alias("_c"))
    bstats = bc.groupBy(id_col).agg(
        F.sum("_c").alias("_bn"), F.count(F.lit(1)).alias("_bnd")
    )

    n = F.col("_n").cast("double")
    bn = F.col("_bn").cast("double")
    zero = F.lit(0.0)
    return (
        df.select(id_col)
        .join(wstats, on=id_col, how="left")
        .join(bstats, on=id_col, how="left")
        .select(
            id_col,
            F.coalesce(F.col("_n"), F.lit(0)).cast("bigint").alias("n_words"),
            F.coalesce(
                F.when(F.col("_n") > 0, F.lit(1.0) - F.col("_nd") / n), zero
            ).alias("dup_word_frac"),
            F.coalesce(
                F.when(F.col("_n") > 0, F.col("_top") / n), zero
            ).alias("top_word_frac"),
            F.coalesce(
                F.when(F.col("_n") > 0, F.log2(n) - F.col("_clog") / n), zero
            ).alias("word_entropy"),
            F.coalesce(F.col("_bn"), F.lit(0)).cast("bigint").alias("n_bigrams"),
            F.coalesce(
                F.when(F.col("_bn") > 0, F.lit(1.0) - F.col("_bnd") / bn), zero
            ).alias("dup_bigram_frac"),
        )
    )


def bigram_pmi(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    min_count: int = 5,
) -> DataFrame:
    """Collocation mining: pointwise mutual information for every word
    bigram occurring at least ``min_count`` times in the corpus —
    PMI(w1,w2) = log2(P(w1w2) / (P(w1)·P(w2))), unigram probabilities
    over word occurrences, bigram probability over bigram occurrences.
    The standard phrase-discovery signal for tokenizer/vocab curation.

    Selection is by INTEGER count threshold, not float top-k: a PMI-
    ordered top-k would make the selection boundary depend on
    last-bit float differences and break cross-engine determinism;
    thresholded output is a pure function of exact counts, with PMI as
    an annotation column.

    Distributed shape: two explode→groupBy count aggs (word, bigram) —
    map-side partials absorb the fan-out; corpus totals are 1-row
    aggregates broadcast via crossJoin (never collected to the
    driver); the post-threshold bigram table is the SMALL side and is
    broadcast onto the unigram counts twice (w1, w2 probes), so the
    full word-count table never shuffles again. No UDF, no window.
    """
    t = F.col(text_col)
    words = df.select(F.explode(tokens(t)).alias("_w"))
    wc = words.groupBy("_w").agg(F.count(F.lit(1)).alias("_c"))
    bigr = df.select(F.explode(all_word_ngrams(t, 2)).alias("_g"))
    bcnt = (
        bigr.groupBy("_g")
        .agg(F.count(F.lit(1)).alias("c12"))
        .where(F.col("c12") >= int(min_count))
    )
    tot_w = words.agg(F.count(F.lit(1)).alias("_nw"))
    tot_b = bigr.agg(F.count(F.lit(1)).alias("_nb"))

    pair = bcnt.select(
        F.split("_g", " ")[0].alias("w1"),
        F.split("_g", " ")[1].alias("w2"),
        "c12",
    )
    c1 = wc.select(F.col("_w").alias("w1"), F.col("_c").alias("_c1"))
    c2 = wc.select(F.col("_w").alias("w2"), F.col("_c").alias("_c2"))
    # pair is the thresholded (small) side: broadcast it through both
    # unigram probes so the word-count table streams without shuffling
    with_c1 = c1.join(F.broadcast(pair), on="w1", how="inner")
    joined = c2.join(F.broadcast(with_c1), on="w2", how="inner")
    nw = F.col("_nw").cast("double")
    nb = F.col("_nb").cast("double")
    return (
        joined.crossJoin(F.broadcast(tot_w))
        .crossJoin(F.broadcast(tot_b))
        .select(
            "w1",
            "w2",
            F.col("c12").cast("bigint").alias("c12"),
            F.log2(
                (F.col("c12") / nb)
                / ((F.col("_c1") / nw) * (F.col("_c2") / nw))
            ).alias("pmi"),
        )
    )


def bpe_pair_counts(
    df: DataFrame,
    text_col: str = "text",
    *,
    top_n: int = 50,
    min_word_len: int = 2,
) -> DataFrame:
    """First-iteration BPE merge statistics: frequency of every
    adjacent character pair across the corpus, weighted by word
    frequency → ``(left_sym, right_sym, pair_count)``, the top
    ``top_n`` by count (deterministic tie-break on the symbols).
    The most frequent pair is exactly the first merge a BPE
    tokenizer trainer would pick; re-running after applying a merge
    yields the next, so this is the distributed inner loop of
    BPE-vocab training over the corpus the engine curates
    (tokenizer prep — the step after `vocab_coverage`'s OOV audit).

    Scale shape — the trick real BPE trainers use: pair statistics
    are computed on the DISTINCT-WORD table weighted by word
    frequency, never on the corpus. One corpus-sized explode+shuffle
    builds the word-frequency table (map-side partial counts); the
    per-character explode and the pair aggregation then run on the
    vocab-sized table (≤ a few million rows at 100 TB — Heaps' law),
    so each merge iteration costs O(vocab), not O(corpus tokens).
    ``sequence(1, len-1)`` is guarded by ``min_word_len`` (Spark's
    sequence DESCENDS for stop < start rather than returning empty).
    """
    words = (
        df.select(F.explode(tokens(normalize_text(F.col(text_col)))).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("wf"))
        .where(F.length("word") >= min_word_len)
    )
    pairs = words.select(
        "word",
        "wf",
        F.explode(F.sequence(F.lit(1), F.length("word") - 1)).alias("i"),
    ).select(
        F.col("word").substr(F.col("i"), F.lit(1)).alias("left_sym"),
        F.col("word").substr(F.col("i") + F.lit(1), F.lit(1)).alias("right_sym"),
        "wf",
    )
    return (
        pairs.groupBy("left_sym", "right_sym")
        .agg(F.sum("wf").cast("bigint").alias("pair_count"))
        .orderBy(F.desc("pair_count"), "left_sym", "right_sym")
        .limit(top_n)
    )


def source_overlap(
    df: DataFrame,
    text_col: str = "text",
    source_col: str = "source",
    *,
    n: int = 3,
) -> DataFrame:
    """Cross-source contamination matrix: for every source pair, the
    count of shared distinct word ``n``-grams and their Jaccard
    overlap → ``(source_a, source_b, n_shared, n_a, n_b, jaccard)``.

    The corpus-mix companion to :func:`~.dedup.decontaminate` (which
    probes a known eval set): high Jaccard between two "independent"
    crawls means one mirrors the other — deduplicate across them
    before weighting the mixture (:func:`~.sampling.mixture_rates`).

    Shape: ONE corpus explode → distinct (source, gram-hash48) — the
    per-source gram vocabulary (map-side dedup). The pair join is
    keyed on the gram hash with fan-out bounded by the number of
    SOURCES containing each gram (≤ #sources, a handful by nature —
    never doc-count). Per-source totals are a tiny table broadcast
    onto the pair counts.
    """
    from pyspark import StorageLevel

    sg = (
        df.select(
            F.col(source_col).alias("src"),
            F.explode(word_shingles(normalize_text(F.col(text_col)), n)).alias("_sh"),
        )
        .select("src", stable_hash48(F.col("_sh")).alias("gh"))
        .distinct()
        # referenced by both join sides AND the totals — persist the
        # per-source vocabulary (distinct grams, a sliver of the
        # corpus) so the corpus explode runs exactly once; blocks are
        # evictable and ContextCleaner reclaims them with the plan
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    a = sg.select(F.col("src").alias("source_a"), "gh")
    b = sg.select(F.col("src").alias("source_b"), "gh")
    shared = (
        a.join(b, "gh")
        .where(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_shared"))
    )
    totals = sg.groupBy("src").agg(F.count(F.lit(1)).alias("n_grams"))
    ta = totals.select(F.col("src").alias("source_a"), F.col("n_grams").alias("n_a"))
    tb = totals.select(F.col("src").alias("source_b"), F.col("n_grams").alias("n_b"))
    return (
        shared.join(F.broadcast(ta), "source_a")
        .join(F.broadcast(tb), "source_b")
        .select(
            "source_a",
            "source_b",
            "n_shared",
            F.col("n_a").cast("bigint").alias("n_a"),
            F.col("n_b").cast("bigint").alias("n_b"),
            F.round(
                F.col("n_shared")
                / (F.col("n_a") + F.col("n_b") - F.col("n_shared")),
                6,
            ).alias("jaccard"),
        )
    )


def zipf_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Zipf's-law fit of the corpus word-frequency distribution → ONE
    row ``(vocab_size, total_tokens, zipf_slope, zipf_r2)`` where
    slope is the OLS coefficient of ``ln(freq) ~ ln(avg_desc_rank)``
    over all vocabulary words (natural text ≈ −1; a slope far from
    −1 or a poor r² flags synthetic/boilerplate-heavy corpora — the
    corpus-health screen next to :func:`repetition_stats`).

    Shape: word counts collapse the corpus (one shuffle, map-side
    combined) and are immediately re-collapsed to the DISTINCT-COUNT
    table — frequency ranks are computed there via the same
    distributed value-order prefix sum as ``encoders.rank_normalize``
    (no single-partition sort of the vocab). Words tied at a count
    share their average rank (scipy ``rankdata(method='average')``),
    so the regression runs as count-weighted sums over the tiny
    distinct-count table — algebraically identical to per-word OLS.
    """
    from kkbox_churn_prediction_spark.operators.encoders import (
        value_rank_components,
    )

    words = (
        df.select(F.explode(tokens(normalize_text(F.col(text_col)))).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    # words is replayed by the rank components' quantile probe, the
    # totals agg, and the regression points — persist the vocab-sized
    # table so the corpus explode+shuffle above runs exactly once
    # (Heaps' law keeps the vocabulary a sliver of the corpus; the
    # cached blocks are evictable and ContextCleaner reclaims them
    # when the plan is released)
    from pyspark import StorageLevel

    words = words.persist(StorageLevel.MEMORY_AND_DISK)
    comp = value_rank_components(words, "c")  # (c, _cnt words, _before)
    # vocab size V and token total ride one-row broadcasts
    tot = comp.agg(
        F.sum("_cnt").alias("_v"),
        F.sum(F.col("c") * F.col("_cnt")).alias("_t"),
    )
    pts = comp.crossJoin(F.broadcast(tot)).select(
        F.col("_v"),
        F.col("_t"),
        F.col("_cnt").cast("double").alias("w"),
        F.log(F.col("_v") - (F.col("_before") + (F.col("_cnt") - 1) / 2.0)).alias(
            "x"
        ),  # ln(1-based average DESC rank)
        F.log(F.col("c").cast("double")).alias("y"),
    )
    agg = pts.agg(
        F.first("_v").alias("v"),
        F.first("_t").alias("t"),
        F.sum("w").alias("sw"),
        F.sum(F.col("w") * F.col("x")).alias("sx"),
        F.sum(F.col("w") * F.col("y")).alias("sy"),
        F.sum(F.col("w") * F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("w") * F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("w") * F.col("x") * F.col("y")).alias("sxy"),
    )
    cov_xy = F.col("sxy") - F.col("sx") * F.col("sy") / F.col("sw")
    var_x = F.col("sxx") - F.col("sx") * F.col("sx") / F.col("sw")
    var_y = F.col("syy") - F.col("sy") * F.col("sy") / F.col("sw")
    # degenerate vocabularies (one distinct count → var 0) yield NULL,
    # matching the oracle's regr_slope/corr — an unguarded division
    # throws under Spark 4's default ANSI mode. The threshold is an
    # epsilon, not 0: the Σ-form variance of an all-ties rank column
    # leaves an O(1e-16) float residual, and any REAL two-rank
    # vocabulary has variance ≥ (Δln rank)² ≫ 1e-9.
    eps = F.lit(1e-9)
    return agg.select(
        # coalesce 0: an EMPTY corpus has vocab size 0 (the oracle's
        # COUNT answer), not NULL from first-over-empty (r5 empty-sweep)
        F.coalesce(F.col("v"), F.lit(0)).cast("bigint").alias("vocab_size"),
        F.col("t").cast("bigint").alias("total_tokens"),
        F.round(F.when(var_x > eps, cov_xy / var_x), 6).alias("zipf_slope"),
        F.round(
            F.when(
                (var_x > eps) & (var_y > eps), (cov_xy * cov_xy) / (var_x * var_y)
            ),
            6,
        ).alias("zipf_r2"),
    )


def bigram_logprob_score(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    lam: float = 0.7,
    broadcast_tables: bool = True,
) -> DataFrame:
    """Interpolated bigram-LM quality proxy → ``(doc_id, n_bigrams,
    avg_bigram_logprob)``: each word bigram scores
    ``ln(λ·c12/c1 + (1−λ)·c2/T)`` against the corpus's own counts,
    where ``c1 = Σ_w c(w1, w)`` is the CONTEXT count (not the raw
    unigram, so probabilities per context sum to 1) and the unigram
    backoff term keeps unseen-continuation mass nonzero. The sharper
    successor to :func:`unigram_logprob_score` — word-salad with
    plausible unigrams but impossible transitions scores low.

    Shape (the tfidf/unigram two-table pattern, one extra level): the
    bigram and unigram tables reduce from the exploded streams
    (map-side partials); the smoothing joins run TABLE-side (bigram ⋈
    context ⋈ unigram — all vocab-bounded, never the corpus stream),
    so the corpus-sized bigram stream touches exactly ONE join probe
    against the finished log-prob table (broadcast by default;
    ``broadcast_tables=False`` switches the probe to a shuffle join
    for open-vocabulary corpora).
    """
    norm = normalize_text(F.col(text_col))
    bg = df.select(
        F.col(id_col), F.explode(all_word_ngrams(norm, 2)).alias("bigram")
    )
    bcnt = bg.groupBy("bigram").agg(F.count(F.lit(1)).alias("c12"))
    words = (
        df.select(F.explode(tokens(norm)).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    total = words.agg(F.sum("c").alias("_T"))
    ctx = bcnt.select(
        F.substring_index("bigram", " ", 1).alias("w1"), "c12"
    ).groupBy("w1").agg(F.sum("c12").alias("c1"))
    probs = (
        bcnt.select(
            "bigram",
            "c12",
            F.substring_index("bigram", " ", 1).alias("w1"),
            F.substring_index("bigram", " ", -1).alias("w2"),
        )
        .join(ctx, "w1")
        .join(words.select(F.col("w").alias("w2"), F.col("c").alias("c2")), "w2")
        .crossJoin(F.broadcast(total))
        .select(
            "bigram",
            F.log(
                F.lit(float(lam)) * F.col("c12") / F.col("c1")
                + F.lit(1.0 - float(lam)) * F.col("c2") / F.col("_T")
            ).alias("_lp"),
        )
    )
    probs_side = F.broadcast(probs) if broadcast_tables else probs
    return (
        bg.join(probs_side, "bigram")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
            F.round(F.avg("_lp"), 6).alias("avg_bigram_logprob"),
        )
    )


def blocklist_filter(
    df: DataFrame,
    blocklist: tuple[str, ...],
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_fraction: float = 0.1,
) -> DataFrame:
    """Blocklist curation stage: per doc, the count and fraction of
    tokens matching a (normalized) blocklist plus a keep/drop verdict
    at ``max_fraction`` →
    ``(doc_id, n_tokens, n_blocked, blocked_fraction, keep)``. The
    list-based companion to the regex scrubber (``redact.py``):
    redaction rewrites matched spans, this DROPS documents whose
    blocked-token share crosses the policy line (the standard
    pretraining-corpus safety/spam filter stage).

    Pure column expressions: the blocklist is a tiny array literal and
    the membership test is a ``filter`` higher-order function over the
    token array — no join, no UDF, no shuffle; embarrassingly
    parallel like the rest of the quality family.
    """
    toks = tokens(normalize_text(F.col(text_col)))
    arr = F.array(*[F.lit(w.lower()) for w in blocklist])
    n_tok = F.size(toks).cast("bigint")
    n_blk = F.size(F.filter(toks, lambda t: F.array_contains(arr, t))).cast("bigint")
    frac = F.round(n_blk / F.greatest(n_tok, F.lit(1)), 6)
    return df.select(
        F.col(id_col),
        n_tok.alias("n_tokens"),
        n_blk.alias("n_blocked"),
        frac.alias("blocked_fraction"),
        (frac <= F.lit(float(max_fraction))).alias("keep"),
    )


def dsir_scores(
    df: DataFrame,
    is_target: Column,
    *,
    n_buckets: int = 4096,
    smoothing: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """DSIR-style domain-relevance importance weights (Data Selection
    via Importance Resampling, Xie et al. 2023): score every document
    by the mean hashed-unigram log-likelihood RATIO between a target
    domain (rows where ``is_target``) and the raw pool (the rest) —
    ``avg over tokens of [ln p̂_target(b) − ln p̂_raw(b)]`` with add-s
    smoothing over ``n_buckets`` hash buckets. High scores = "reads
    like the target domain"; feed the scores to
    :func:`~kkbox_churn_prediction_spark.operators.sampling.distribution_match_sample`
    or a threshold filter to build the selected corpus. The
    cross-corpus sibling of :func:`unigram_logprob_score` (which
    scores against the corpus's OWN distribution).

    Shape: ONE explode into a slim hashed (doc, bucket) stream,
    persisted — two consumers (the bucket count table and the score
    join) must not re-scan the corpus; the bucket table is
    ``n_buckets`` rows → broadcast back onto the stream; totals ride
    a one-row broadcast; per-doc reduce is algebraic with map-side
    partials. Hashing bounds vocabulary state at any corpus size —
    the reason DSIR hashes in the first place.
    """
    nb = int(n_buckets)
    s = float(smoothing)
    toks = (
        df.select(
            F.col(id_col),
            is_target.cast("boolean").alias("_t"),
            F.explode(tokens(normalize_text(F.col(text_col)))).alias("_w"),
        )
        .select(
            id_col,
            "_t",
            F.pmod(stable_hash48(F.col("_w")), F.lit(nb)).alias("b"),
        )
        .persist()
    )
    buckets = toks.groupBy("b").agg(
        F.sum(F.when(F.col("_t"), 1).otherwise(0)).cast("long").alias("tc"),
        F.sum(F.when(F.col("_t"), 0).otherwise(1)).cast("long").alias("rc"),
    )
    totals = buckets.agg(
        (F.sum("tc") * 1.0).alias("tt"), (F.sum("rc") * 1.0).alias("tr")
    )
    logw = (
        buckets.crossJoin(F.broadcast(totals))
        .select(
            "b",
            (
                F.log((F.col("tc") + s) / (F.col("tt") + s * nb))
                - F.log((F.col("rc") + s) / (F.col("tr") + s * nb))
            ).alias("lw"),
        )
    )
    return (
        toks.join(F.broadcast(logw), "b")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_scored_tokens"),
            F.round(F.avg("lw"), 6).alias("dsir_logratio"),
        )
    )


def vocab_growth(
    turns: DataFrame,
    *,
    text_col: str = "text",
    ts_col: str = "ts",
    grain: str = "week",
) -> DataFrame:
    """Vocabulary growth curve over ingestion time: per ``grain``
    bucket, the distinct token types used, the types NEVER seen in an
    earlier bucket, and the cumulative type count — the corpus
    freshness metric ("is new data still bringing new language, or
    are we re-crawling the same text?"). A flattening curve is the
    standard signal to rebalance sources; pairs with
    :func:`~..operators.textstats.zipf_stats` (static shape) as the
    temporal view of vocabulary.

    Shape: tokens reduce to 48-bit hashes BEFORE the (bucket, type)
    distinct — shuffles carry hashes; first-seen is one min-agg over
    the (bucket, type) pairs; the cumulative sum runs on the
    bucket-count table (≤ #weeks rows — the SinglePartition window is
    on a provably tiny series, the daily_anomalies exemption).
    """
    from kkbox_churn_prediction_spark.functions.text import (
        normalize_text,
        stable_hash48,
        tokens,
    )
    from pyspark.sql import Window

    toks = turns.select(
        F.date_trunc(grain, F.col(ts_col)).alias("bucket"),
        F.explode(tokens(normalize_text(F.col(text_col)))).alias("_w"),
    ).select("bucket", stable_hash48(F.col("_w")).alias("_tk"))
    pairs = toks.distinct()
    first = pairs.groupBy("_tk").agg(F.min("bucket").alias("bucket"))
    news = first.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n_new_types")
    )
    tot = pairs.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n_types")
    )
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    return (
        tot.join(news, "bucket", "left")
        .select(
            "bucket",
            "n_types",
            F.coalesce(F.col("n_new_types"), F.lit(0)).alias("n_new_types"),
        )
        .withColumn("cum_types", F.sum("n_new_types").over(w).cast("long"))
    )


def distinctive_terms(
    df: DataFrame,
    is_target: Column,
    *,
    alpha: float = 0.5,
    k: int = 25,
    min_count: int = 5,
    text_col: str = "text",
) -> DataFrame:
    """Fightin'-words distinctive terms (Monroe, Colaresi & Quinn
    2008): for every term, the log-odds ratio between the target and
    the rest of the pool with a symmetric Dirichlet prior α, scaled
    by its estimated standard error —

    ``z = [ln((y_t+α)/(n_t+αV−y_t−α)) − ln((y_r+α)/(n_r+αV−y_r−α))]
          / sqrt(1/(y_t+α) + 1/(y_r+α))``

    — the corpus-COMPARISON view the doc-level scorers can't give:
    TF-IDF says what's distinctive about one document, DSIR scores
    whole documents; this names the TERMS that separate two sources
    (the top-k per side, deterministic tiebreak). Low-count noise is
    pruned by ``min_count`` BEFORE the prior is applied.

    Shape: ONE exploded token pass → per-(term) conditional counts
    (map-side partials); totals and vocabulary size ride a one-row
    broadcast; z is pure column algebra on the vocab-sized table;
    TakeOrdered top-k each side. The vocabulary never exceeds the
    term table — no per-doc state.
    """
    toks = df.select(
        is_target.cast("boolean").alias("_t"),
        F.explode(tokens(normalize_text(F.col(text_col)))).alias("term"),
    )
    counts = toks.groupBy("term").agg(
        F.sum(F.when(F.col("_t"), 1).otherwise(0)).cast("long").alias("yt"),
        F.sum(F.when(F.col("_t"), 0).otherwise(1)).cast("long").alias("yr"),
    )
    counts = counts.where(F.col("yt") + F.col("yr") >= int(min_count))
    tot = counts.agg(
        F.sum("yt").alias("nt"),
        F.sum("yr").alias("nr"),
        F.count(F.lit(1)).cast("long").alias("v"),
    )
    a = float(alpha)
    j = counts.crossJoin(F.broadcast(tot))
    lt = F.log(
        (F.col("yt") + a) / (F.col("nt") + a * F.col("v") - F.col("yt") - a)
    )
    lr = F.log(
        (F.col("yr") + a) / (F.col("nr") + a * F.col("v") - F.col("yr") - a)
    )
    se = F.sqrt(1.0 / (F.col("yt") + a) + 1.0 / (F.col("yr") + a))
    scored = j.select(
        "term",
        "yt",
        "yr",
        F.round((lt - lr) / se, 6).alias("z"),
    )
    top = scored.orderBy(F.desc("z"), "term").limit(int(k)).withColumn(
        "side", F.lit("target")
    )
    bottom = scored.orderBy(F.asc("z"), "term").limit(int(k)).withColumn(
        "side", F.lit("rest")
    )
    return top.unionAll(bottom)


def heaps_law_fit(
    turns: DataFrame,
    *,
    text_col: str = "text",
    ts_col: str = "ts",
    grain: str = "week",
    eps: float = 1e-12,
) -> DataFrame:
    """Heaps'-law fit over ingestion time: regress ln(cumulative
    distinct types) on ln(cumulative tokens) across time buckets →
    one row ``(n_points, beta, ln_k, r2)`` for ``V = K·N^β``
    (natural corpora: β ≈ 0.4–0.6; β near 0 = re-crawled/duplicated
    text, β near 1 = noise/IDs). The scaling-law summary of
    :func:`vocab_growth`'s curve, and the temporal companion to
    ``zipf_stats``' static rank fit.

    Shape: one exploded token pass → per-bucket token counts AND the
    first-seen type counts (the vocab_growth machinery); cumulative
    sums + the log-log OLS run on the ≤ #buckets series (tiny-table
    exemption). Same explicit co-moment shapes as ``activity_trend``
    so the oracle agrees bit-for-bit at 6dp.
    """
    from kkbox_churn_prediction_spark.functions.text import (
        normalize_text,
        stable_hash48,
        tokens,
    )
    from pyspark.sql import Window

    toks = turns.select(
        F.date_trunc(grain, F.col(ts_col)).alias("bucket"),
        F.explode(tokens(normalize_text(F.col(text_col)))).alias("_w"),
    ).select("bucket", stable_hash48(F.col("_w")).alias("_tk"))
    tok_counts = toks.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("long").alias("_ntok")
    )
    first = (
        toks.distinct()
        .groupBy("_tk")
        .agg(F.min("bucket").alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("_nnew"))
    )
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    series = (
        tok_counts.join(first, "bucket", "left")
        .select(
            "bucket",
            F.sum("_ntok").over(w).alias("_cumtok"),
            F.sum(F.coalesce(F.col("_nnew"), F.lit(0))).over(w).alias("_cumtyp"),
        )
        .select(
            F.log(F.col("_cumtok").cast("double")).alias("x"),
            F.log(F.col("_cumtyp").cast("double")).alias("y"),
        )
    )
    n = F.count(F.lit(1)).cast("double")
    sx, sy = F.sum("x"), F.sum("y")
    sxy, sxx = F.sum(F.col("x") * F.col("y")), F.sum(F.col("x") * F.col("x"))
    syy = F.sum(F.col("y") * F.col("y"))
    vx = n * sxx - sx * sx
    vy = n * syy - sy * sy
    cov = n * sxy - sx * sy
    beta = cov / vx
    return series.agg(
        n.cast("long").alias("n_points"),
        F.round(F.when(vx > eps, beta), 6).alias("beta"),
        F.round(F.when(vx > eps, (sy - beta * sx) / n), 6).alias("ln_k"),
        F.round(
            F.when((vx > eps) & (vy > eps), cov * cov / (vx * vy)), 6
        ).alias("r2"),
    )


def vocab_threshold_coverage(
    df: DataFrame,
    *,
    thresholds: tuple[int, ...] = (1, 2, 5, 10, 20, 50, 100),
    text_col: str = "text",
) -> DataFrame:
    """Tokenizer-budget sizing curve: for each minimum-frequency
    floor ``t``, how many token TYPES survive (``count ≥ t``) and
    what share of the corpus token MASS they cover —
    ``(threshold, n_types, token_share)``. The empirical answer to
    "a vocabulary keeping every type seen ≥ t times covers X% of
    tokens", the decision table behind vocab truncation / min-count
    cuts (the rank-free complement of the Zipf fit: no top-k sort of
    the vocabulary, which at web scale is itself a big table).

    Shape: one exploded token pass → the type-count table (map-side
    partials), then the whole curve is ONE pass over that table —
    per-threshold conditional sums via an in-row explode (×|grid|
    rows of the VOCAB table, never the corpus). Everything after the
    type-count reduce is vocabulary-sized.
    """
    from kkbox_churn_prediction_spark.functions.text import (
        normalize_text,
        stable_hash48,
        tokens,
    )

    vocab = (
        df.select(
            F.explode(tokens(normalize_text(F.col(text_col)))).alias("_w")
        )
        .select(stable_hash48(F.col("_w")).alias("_tk"))
        .groupBy("_tk")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    arms = [
        F.struct(
            F.lit(int(t)).alias("threshold"),
            F.when(F.col("c") >= int(t), 1).otherwise(0).alias("keep"),
            F.when(F.col("c") >= int(t), F.col("c")).otherwise(0).alias("mass"),
        )
        for t in thresholds
    ]
    total = vocab.agg(F.sum("c").alias("_tot"))
    stacked = (
        vocab.select(F.explode(F.array(*arms)).alias("s"))
        .select("s.threshold", "s.keep", "s.mass")
        .groupBy("threshold")
        .agg(
            F.sum("keep").cast("long").alias("n_types"),
            F.sum("mass").alias("_mass"),
        )
    )
    return stacked.crossJoin(F.broadcast(total)).select(
        "threshold",
        "n_types",
        F.round(F.col("_mass") * 1.0 / F.col("_tot"), 6).alias("token_share"),
    )


def distinct_ngram_diversity(
    df: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
) -> DataFrame:
    """Distinct-n corpus diversity per slice: for n = 1, 2, 3, the
    ratio of distinct n-grams to total n-grams (distinct-1 is the
    type/token ratio; distinct-2/3 are the standard generation- and
    corpus-diversity metrics). A slice whose distinct-2 collapses is
    template-heavy / self-repeating — exactly the text a pre-training
    curation pass down-weights.

    Differs from :func:`repetition_stats` (per-DOC duplicate-gram
    fraction) by measuring diversity across the whole slice, where
    cross-document boilerplate shows up.

    Determinism: totals and distinct counts are exact longs; each
    ratio is ONE long/long double division — no float summation.

    Distributed shape: ONE corpus scan — every n-gram order is tagged
    (n, gram) in a single staged projection (tokens evaluate once) and
    exploded together, so the (slice, n, gram) hash agg and the
    per-slice conditional rollup are the only two shuffles at any
    scale. Output rows = |slices|. (A per-n loop would be 3 corpus
    scans for the same answer — rejected for the 100 TB shape.)
    """
    g = F.col(group_col)
    t = F.col(text_col)

    def grams_from(toks: Column, n: int) -> Column:
        # same construction as functions.text.all_word_ngrams, applied
        # to the already-tokenized column so the tokenizer runs once
        if n == 1:
            return toks
        return F.when(
            F.size(toks) >= n,
            F.transform(
                F.sequence(F.lit(1), F.size(toks) - n + 1),
                lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
            ),
        ).otherwise(F.array().cast("array<string>"))

    def tagged(toks: Column, n: int) -> Column:
        return F.transform(
            grams_from(toks, n),
            lambda w: F.struct(F.lit(n).alias("n"), w.alias("g")),
        )

    base = df.select(g.alias("_grp"), tokens(t).alias("_toks"))
    stream = base.select(
        "_grp",
        F.explode(
            F.concat(
                tagged(F.col("_toks"), 1),
                tagged(F.col("_toks"), 2),
                tagged(F.col("_toks"), 3),
            )
        ).alias("_x"),
    ).select("_grp", F.col("_x.n").alias("_n"), F.col("_x.g").alias("_g"))
    cnt = stream.groupBy("_grp", "_n", "_g").agg(F.count(F.lit(1)).alias("_c"))
    per = cnt.groupBy("_grp", "_n").agg(
        F.sum("_c").cast("long").alias("_tot"),
        F.count(F.lit(1)).cast("long").alias("_dis"),
    )

    def pick(n: int, col: str) -> Column:
        return (
            F.coalesce(F.sum(F.when(F.col("_n") == n, F.col(col))), F.lit(0))
            .cast("long")
        )

    wide = per.groupBy("_grp").agg(
        pick(1, "_tot").alias("n_unigrams"),
        pick(1, "_dis").alias("distinct_unigrams"),
        pick(2, "_tot").alias("n_bigrams"),
        pick(2, "_dis").alias("distinct_bigrams"),
        pick(3, "_tot").alias("n_trigrams"),
        pick(3, "_dis").alias("distinct_trigrams"),
    )

    def ratio(tag: str) -> Column:
        tot = F.col(f"n_{tag}")
        dis = F.col(f"distinct_{tag}")
        return F.when(
            tot > 0, dis.cast("double") / tot.cast("double")
        ).otherwise(F.lit(0.0))

    return wide.select(
        F.col("_grp").alias(group_col),
        F.col("n_unigrams"),
        F.col("distinct_unigrams"),
        ratio("unigrams").alias("distinct_1"),
        F.col("n_bigrams"),
        F.col("distinct_bigrams"),
        ratio("bigrams").alias("distinct_2"),
        F.col("n_trigrams"),
        F.col("distinct_trigrams"),
        ratio("trigrams").alias("distinct_3"),
    )


def readability_stats(
    df: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
) -> DataFrame:
    """Flesch reading-ease per corpus slice — the classic readability
    quality filter (C4/FineWeb-style pipelines gate on it): FRE =
    206.835 − 1.015·(words/sentences) − 84.6·(syllables/word), with
    sentences counted as runs of [.!?] (min 1 per non-empty doc) and
    syllables approximated as vowel-letter groups per word (min 1 —
    the standard heuristic; 'rhythm'-class all-consonant words still
    score one syllable).

    Determinism: the three components are exact LONG sums; FRE is one
    fixed-shape double expression over their ratios, so both engines
    evaluate the identical tree — no per-doc float averaging.

    Distributed shape: per-row integer counters (regexp_extract_all +
    a bind-once HOF sum over the token array — interpreted, but
    integer-only and allocation-light) followed by ONE hash agg keyed
    by the slice; output rows = |slices|.
    """
    t = F.col(text_col)
    toks = tokens(t)
    n_words = F.size(toks).cast("long")
    sent_runs = F.size(F.regexp_extract_all(t, F.lit(r"[.!?]+"), F.lit(0)))
    n_sents = F.when(
        n_words > 0, F.greatest(sent_runs, F.lit(1))
    ).otherwise(F.lit(0)).cast("long")
    syl_per_word = lambda w: F.greatest(  # noqa: E731
        F.size(F.regexp_extract_all(F.lower(w), F.lit("[aeiouy]+"), F.lit(0))),
        F.lit(1),
    )
    n_syll = F.aggregate(
        toks, F.lit(0), lambda acc, w: acc + syl_per_word(w)
    ).cast("long")

    per = df.select(
        F.col(group_col).alias(group_col),
        n_words.alias("_w"),
        n_sents.alias("_s"),
        n_syll.alias("_y"),
    ).groupBy(group_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("_w").cast("long").alias("n_words"),
        F.sum("_s").cast("long").alias("n_sentences"),
        F.sum("_y").cast("long").alias("n_syllables"),
    )
    w = F.col("n_words").cast("double")
    s = F.col("n_sentences").cast("double")
    y = F.col("n_syllables").cast("double")
    wps = F.when(F.col("n_sentences") > 0, w / s).otherwise(F.lit(0.0))
    spw = F.when(F.col("n_words") > 0, y / w).otherwise(F.lit(0.0))
    fre = F.lit(206.835) - F.lit(1.015) * wps - F.lit(84.6) * spw
    return per.select(
        group_col,
        "n_docs",
        "n_words",
        "n_sentences",
        "n_syllables",
        wps.alias("words_per_sentence"),
        spw.alias("syllables_per_word"),
        fre.alias("flesch_reading_ease"),
    )


def tokenizer_fertility(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Tokenizer fertility per predicted language: UTF-8 bytes /
    characters / whitespace words per (BPE-ish) token, aggregated over
    each language slice — the tokenizer-equity audit multilingual
    pipelines run (a language whose bytes-per-token is 3× English pays
    3× the context budget for the same content).

    Language prediction reuses the staged :func:`lang_id` machinery
    verbatim (same scores, same argmax tiebreak, 'und' fallback), so
    this gate and ``lang_id`` can never disagree on the slice.

    Determinism: the four per-slice reductions are exact LONG sums;
    every ratio is one fixed-shape double division.

    Distributed shape: one projection (heavy subtrees staged so each
    evaluates once) + ONE hash agg keyed by language; output rows =
    |languages| + 'und'.
    """
    t = F.col(text_col)
    staged = df.select(
        F.octet_length(t).cast("long").alias("_bytes"),
        F.length(t).cast("long").alias("_chars"),
        bpe_ish_token_count(t).alias("_bpe"),
        *doc_signal_stage1(t, quality=False),
    ).select(
        "_bytes",
        "_chars",
        "_bpe",
        F.col("n_tokens").alias("_words"),
        *doc_signal_stage2(quality=False),
    )
    tagged = staged.select(
        lang_pred_from_scores().alias("lang"), "_bytes", "_chars", "_bpe", "_words"
    )
    per = tagged.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("_bytes").cast("long").alias("n_bytes"),
        F.sum("_chars").cast("long").alias("n_chars"),
        F.sum("_bpe").cast("long").alias("n_tokens"),
        F.sum("_words").cast("long").alias("n_words"),
    )

    def ratio(num: str, den: str) -> Column:
        return F.round(
            F.when(
                F.col(den) > 0, F.col(num).cast("double") / F.col(den).cast("double")
            ).otherwise(F.lit(0.0)),
            6,
        )

    return per.select(
        "lang",
        "n_docs",
        "n_bytes",
        "n_chars",
        "n_tokens",
        "n_words",
        ratio("n_bytes", "n_tokens").alias("bytes_per_token"),
        ratio("n_chars", "n_tokens").alias("chars_per_token"),
        ratio("n_tokens", "n_words").alias("tokens_per_word"),
    )


def source_tf_cosine(
    df: DataFrame,
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Frequency-weighted source similarity: cosine of the term-
    frequency vectors of every source pair →
    ``(source_a, source_b, dot, n2_a, n2_b, cosine)``. The
    distributional companion to :func:`source_overlap`: Jaccard over
    distinct n-grams says "do these crawls share CONTENT"; TF cosine
    says "do they have the same TOPIC/STYLE mix" even when the actual
    documents differ — the signal mixture weighting needs when two
    sources are near-identical distributions and one should be
    down-weighted.

    Determinism: the dot product and both norms are EXACT — decimal
    sums of long count products — and the cosine is one fixed-shape
    double expression over those exact scalars.

    Shape: ONE corpus explode → (source, token-hash48) count agg
    (vocab-bounded, map-side partials, persisted for the three
    branches); the pair join is keyed on the token hash with fan-out
    bounded by #sources per token (≤ |sources|); norms are a tiny
    broadcast table.
    """
    from pyspark import StorageLevel

    from kkbox_churn_prediction_spark.functions.text import (
        normalize_text,
        stable_hash48,
        tokens,
    )

    dec = "decimal(38,0)"
    tc = (
        df.select(
            F.col(source_col).alias("src"),
            F.explode(tokens(normalize_text(F.col(text_col)))).alias("_t"),
        )
        .select("src", stable_hash48(F.col("_t")).alias("gh"))
        .groupBy("src", "gh")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    a = tc.select(F.col("src").alias("source_a"), "gh", F.col("c").alias("c_a"))
    b = tc.select(F.col("src").alias("source_b"), "gh", F.col("c").alias("c_b"))
    dots = (
        a.join(b, "gh")
        .where(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.sum(F.col("c_a").cast(dec) * F.col("c_b").cast(dec)).alias("_dot"))
    )
    norms = tc.groupBy("src").agg(
        F.sum(F.col("c").cast(dec) * F.col("c").cast(dec)).alias("_n2")
    )
    na = norms.select(F.col("src").alias("source_a"), F.col("_n2").alias("_n2a"))
    nb = norms.select(F.col("src").alias("source_b"), F.col("_n2").alias("_n2b"))
    return (
        dots.join(F.broadcast(na), "source_a")
        .join(F.broadcast(nb), "source_b")
        .select(
            "source_a",
            "source_b",
            F.col("_dot").cast("double").alias("dot"),
            F.col("_n2a").cast("double").alias("n2_a"),
            F.col("_n2b").cast("double").alias("n2_b"),
            F.round(
                F.col("_dot").cast("double")
                / (
                    F.sqrt(F.col("_n2a").cast("double"))
                    * F.sqrt(F.col("_n2b").cast("double"))
                ),
                6,
            ).alias("cosine"),
        )
    )


def kneser_ney_logprob_score(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    discount: float = 0.75,
    broadcast_tables: bool = True,
) -> DataFrame:
    """Kneser–Ney-smoothed bigram-LM quality score → ``(doc_id,
    n_bigrams, avg_kn_logprob, ppl)`` — the modern-smoothing upgrade
    of :func:`bigram_logprob_score` (interpolated KN is the standard
    n-gram LM used for CCNet-style perplexity filtering of
    pretraining corpora — public method, Kneser & Ney 1995):

        p(w2|w1) = max(c12 − d, 0)/c1 + (d·N1+(w1·)/c1)·N1+(·w2)/B

    where ``N1+(w1·)``/``N1+(·w2)`` are distinct continuation /
    predecessor TYPE counts and ``B`` the total bigram types — the
    continuation distribution that makes "Francisco" cheap only
    after "San". Per-doc perplexity ``exp(−avg ln p)`` is the filter
    statistic.

    Shape: identical to the bigram-LM two-level pattern — all
    smoothing tables (bigram counts, context counts, continuation
    type counts) reduce from the exploded streams map-side and join
    TABLE-side (vocab-bounded); the corpus-sized bigram stream
    touches ONE probe against the finished log-prob table. Type
    counts are exact integers by construction (they come from the
    distinct-bigram table itself, no Expand).
    """
    d = float(discount)
    norm = normalize_text(F.col(text_col))
    bg = df.select(
        F.col(id_col), F.explode(all_word_ngrams(norm, 2)).alias("bigram")
    )
    bcnt = bg.groupBy("bigram").agg(F.count(F.lit(1)).alias("c12")).persist()
    split = bcnt.select(
        "bigram",
        "c12",
        F.substring_index("bigram", " ", 1).alias("w1"),
        F.substring_index("bigram", " ", -1).alias("w2"),
    )
    ctx = split.groupBy("w1").agg(
        F.sum("c12").cast("long").alias("c1"),
        F.count(F.lit(1)).cast("long").alias("n1f"),  # N1+(w1·): type fan-out
    )
    pred = split.groupBy("w2").agg(
        F.count(F.lit(1)).cast("long").alias("n1b")  # N1+(·w2): predecessors
    )
    types = bcnt.agg(F.count(F.lit(1)).cast("long").alias("_B"))
    probs = (
        split.join(ctx, "w1")
        .join(pred, "w2")
        .crossJoin(F.broadcast(types))
        .select(
            "bigram",
            F.log(
                F.greatest(
                    F.col("c12").cast("double") - F.lit(d), F.lit(0.0)
                )
                / F.col("c1").cast("double")
                + (F.lit(d) * F.col("n1f").cast("double") / F.col("c1").cast("double"))
                * (F.col("n1b").cast("double") / F.col("_B").cast("double"))
            ).alias("_lp"),
        )
    )
    probs_side = F.broadcast(probs) if broadcast_tables else probs
    scored = (
        bg.join(probs_side, "bigram")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
            # round BEFORE exp: ppl = exp(−avg) amplifies sub-6dp
            # summation wobble by the ppl magnitude, so both engines
            # exponentiate the identical 6dp average instead
            F.round(F.avg("_lp"), 6).alias("avg_kn_logprob"),
        )
    )
    return scored.select(
        id_col,
        "n_bigrams",
        "avg_kn_logprob",
        F.round(F.exp(-F.col("avg_kn_logprob")), 6).alias("ppl"),
    )


# --------------------------------------------------------------------------
# Winnowing (Schleimer, Wilkerson & Aiken, SIGMOD 2003) — the
# guarantee-based local fingerprinting :func:`fingerprint` reduces to a
# single min-sketch: every shared substring of length ≥ w + k − 1 is
# GUARANTEED to share at least one selected fingerprint.

_WINNOW_BASE = 257
_WINNOW_MOD = 2_147_483_647


def winnow_fingerprints(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    window: int = 8,
    impl: str = "arrow",
) -> DataFrame:
    """Winnowing fingerprint table: one row per distinct selected
    fingerprint per document ``(doc_id, fp)``.

    Per document: polynomial hashes of all character ``k``-grams
    (forward orientation, ``Σ ascii(c_{i+j})·B^j mod M`` — exact
    integers, cross-engine identical), then the minimum hash of every
    ``window`` consecutive k-grams, deduplicated. Documents shorter
    than ``k`` chars contribute nothing; documents with fewer than
    ``window`` k-grams contribute the single whole-doc minimum (the
    one-window degenerate case).

    Two result-identical implementations (equality pytest-asserted),
    like ``chunking.cdc_chunk_docs``:

    - ``impl="arrow"`` (default): partition-preserving
      ``mapInPandas`` — k-gram hashes as ``k`` shifted int64
      multiply-adds on the numpy code-point array, window minima via
      ``sliding_window_view``. The scale path: the JVM
      higher-order-function selection is INTERPRETED (HOF lambdas
      never enter whole-stage codegen) and the vectorized rewrite
      measured 5.9× faster at sf0.1 (7.6s → 1.3s best-of, single
      partition — per-core throughput).
    - ``impl="sql"``: in-row higher-order functions (``transform``
      over k-gram positions, ``array_min(slice(...))`` per window,
      ``array_distinct``) — zero Python.

    Both are zero-shuffle, no char explode (the DuckDB oracle explodes
    chars; Spark never does). The only fan-out is the final
    fingerprint ``explode``, ≈ 2/(w+1) selected positions per char
    (the winnowing density bound).
    """
    if impl == "arrow":
        return _winnow_fingerprints_arrow(
            docs,
            text_col=text_col,
            id_col=id_col,
            k=int(k),
            window=int(window),
        )
    kk, w = int(k), int(window)
    pows = [pow(_WINNOW_BASE, j, _WINNOW_MOD) for j in range(kk)]
    pow_arr = F.array(*[F.lit(p) for p in pows])
    text = F.col(text_col)
    n = F.length(text)

    # STAGE 1: char codes as one int-array column — hashing k chars
    # per position via string substr costs k·n string slices per doc;
    # element_at on the staged array is n slices + k·n long reads
    # (the cdc_chunk_docs lesson, ~5× here)
    codes = F.when(
        n >= 1,
        F.transform(
            F.sequence(F.lit(1), n),
            lambda i: F.ascii(text.substr(i, F.lit(1))).cast("long"),
        ),
    ).otherwise(F.array().cast("array<long>"))
    with_codes = docs.select(
        F.col(id_col).alias("doc_id"), codes.alias("_codes")
    )
    carr = F.col("_codes")
    n2 = F.size(carr)
    n_kg = n2 - kk + 1  # k-gram count

    def _kgram_hash(i):
        return (
            F.aggregate(
                F.sequence(F.lit(0), F.lit(kk - 1)),
                F.lit(0).cast("long"),
                lambda acc, j: acc
                + F.element_at(carr, (i + j).cast("int"))
                * F.element_at(pow_arr, j + 1),
            )
            % F.lit(_WINNOW_MOD)
        )

    hashes = F.when(
        n2 >= kk, F.transform(F.sequence(F.lit(1), n_kg), _kgram_hash)
    ).otherwise(F.array().cast("array<long>"))
    # STAGE 2: the hash array as a REAL column before windowing:
    # inlining it would re-evaluate the full O(n·k) transform inside
    # every per-window slice (O(n²·k) per doc — measured as a hang)
    with_h = with_codes.select(
        "doc_id", hashes.alias("_h")
    )
    h = F.col("_h")
    fps = F.when(
        F.size(h) >= w,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.size(h) - w + 1),
                lambda s: F.array_min(F.slice(h, s, w)),
            )
        ),
    ).otherwise(
        F.when(F.size(h) > 0, F.array(F.array_min(h))).otherwise(
            F.array().cast("array<long>")
        )
    )
    return with_h.select("doc_id", F.explode(fps).alias("fp"))


def _winnow_fingerprints_arrow(
    docs: DataFrame,
    *,
    text_col: str,
    id_col: str,
    k: int,
    window: int,
) -> DataFrame:
    """Vectorized winnowing (see :func:`winnow_fingerprints`): one
    partition-preserving ``mapInPandas`` pass. Code points from the
    UTF-32 encoding (index-compatible with Spark's character
    ``substr``), k-gram hashes as ``k`` shifted int64 multiply-adds
    (products < 2^52, one final mod — exact), window minima via
    ``sliding_window_view`` — all C-speed, zero shuffles."""
    from pyspark.sql import types as T

    kk, w = int(k), int(window)
    mod = _WINNOW_MOD
    pows = [pow(_WINNOW_BASE, j, mod) for j in range(kk)]

    id_field = docs.schema[id_col]
    out_schema = T.StructType(
        [
            T.StructField("doc_id", id_field.dataType),
            T.StructField("fp", T.LongType()),
        ]
    )

    def fp_batches(batches):
        import numpy as np
        import pandas as pd
        from numpy.lib.stride_tricks import sliding_window_view

        pw = np.array(pows, dtype=np.int64)
        for pdf in batches:
            ids, fps = [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["_t"]):
                if text is None:
                    continue
                codes = np.frombuffer(
                    text.encode("utf-32-le"), dtype="<u4"
                ).astype(np.int64)
                n = codes.size
                if n < kk:
                    continue
                n_kg = n - kk + 1
                h = np.zeros(n_kg, dtype=np.int64)
                for j in range(kk):
                    h += codes[j : j + n_kg] * pw[j]
                h %= mod
                if n_kg >= w:
                    sel = np.unique(
                        sliding_window_view(h, w).min(axis=1)
                    )
                else:
                    sel = h.min(keepdims=True)
                ids.extend([doc_id] * sel.size)
                fps.extend(sel.tolist())
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype=pdf["doc_id"].dtype),
                    "fp": pd.Series(fps, dtype="int64"),
                }
            )

    staged = docs.select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("_t")
    )
    return staged.mapInPandas(fp_batches, schema=out_schema)


def winnow_overlap_stats(fps: DataFrame) -> DataFrame:
    """Per-document fingerprint-overlap rollup over a
    :func:`winnow_fingerprints` table: ``(doc_id, n_fingerprints,
    n_shared_fp, share_ratio)`` where a fingerprint is shared when it
    appears in ≥ 2 DISTINCT documents.

    One hash agg builds the fingerprint→doc-count table; one join
    flags each fingerprint — the same never-all-pairs discipline as
    the CDC and shingle dedup rollups, with the frequency table
    bounded by the winnowing density (≈ 2/(w+1) of corpus chars).
    """
    freq = fps.groupBy("fp").agg(
        F.countDistinct("doc_id").alias("_d")
    )
    return (
        fps.join(freq, "fp")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_fingerprints"),
            F.sum((F.col("_d") >= 2).cast("int")).cast("long").alias("n_shared_fp"),
            F.round(
                F.sum((F.col("_d") >= 2).cast("int")).cast("double")
                / F.count(F.lit(1)).cast("double"),
                6,
            ).alias("share_ratio"),
        )
    )


def ngram_novelty(
    docs: DataFrame,
    *,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Leave-one-out n-gram novelty per document: the fraction of a
    doc's DISTINCT word n-grams that appear in NO other document
    (corpus document-frequency 1) — the per-doc originality signal
    ``distinct_ngram_diversity`` (corpus-level) and
    ``repetition_stats`` (intra-doc) can't give; low novelty marks
    boilerplate/template members even when no single near-dup pair
    crosses a similarity threshold.

    Shape: one exploded distinct-shingle stream → shingle-df hash agg
    → one join back + per-doc agg (the shingle-family discipline —
    the df table is vocabulary-sized, never all-pairs). Documents
    with fewer than ``n`` tokens have no shingles and are absent from
    the output (both engines).
    """
    from kkbox_churn_prediction_spark.functions.text import (
        normalize_text,
        word_shingles,
    )

    sh = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            word_shingles(normalize_text(F.col(text_col)), n)
        ).alias("sh"),
    )
    df_sh = sh.groupBy("sh").agg(F.count(F.lit(1)).alias("_df"))
    return (
        sh.join(df_sh, "sh")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_shingles"),
            F.sum((F.col("_df") == 1).cast("int")).cast("long").alias("n_novel"),
            F.round(
                F.sum((F.col("_df") == 1).cast("int")).cast("double")
                / F.count(F.lit(1)).cast("double"),
                6,
            ).alias("novelty"),
        )
    )


def vocab_richness(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Chao1 species-richness estimate of the TRUE vocabulary size and
    the Good–Turing sample-coverage estimate — how much vocabulary the
    corpus has NOT seen yet (the capture–recapture complement to
    :func:`heaps_law_fit`, which extrapolates the growth curve; Chao1
    lower-bounds the asymptote from singleton/doubleton counts alone:
    Chao 1984, Good 1953).

    One row: ``(total_tokens, vocab_size, f1, f2, chao1, coverage)``
    with the bias-corrected estimator ``chao1 = V + f1·(f1−1)/(2·(f2+1))``
    (defined even when no doubletons exist) and Good–Turing coverage
    ``1 − f1/N`` (the probability the next token is a seen word).

    Shape: the corpus collapses to word counts in one map-side-combined
    shuffle (the zipf_stats device, same normalize+tokenize so the two
    gates read one vocabulary); everything else is ONE one-row agg over
    the vocab-sized count table — no ranks, no windows, no second pass.
    """
    words = (
        df.select(
            F.explode(tokens(normalize_text(F.col(text_col)))).alias("word")
        )
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    one = words.agg(
        F.sum("c").cast("long").alias("total_tokens"),
        F.count(F.lit(1)).cast("long").alias("vocab_size"),
        F.sum(F.when(F.col("c") == 1, 1).otherwise(0))
        .cast("long")
        .alias("f1"),
        F.sum(F.when(F.col("c") == 2, 1).otherwise(0))
        .cast("long")
        .alias("f2"),
    )
    f1 = F.col("f1").cast("double")
    f2 = F.col("f2").cast("double")
    chao1 = F.col("vocab_size") + f1 * (f1 - 1) / (2 * (f2 + 1))
    cov = F.lit(1.0) - f1 / F.col("total_tokens")
    return one.select(
        "total_tokens",
        "vocab_size",
        "f1",
        "f2",
        F.round(chao1, 6).alias("chao1"),
        F.round(F.when(F.col("total_tokens") > 0, cov), 6).alias("coverage"),
    )


def compression_ratio(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    level: int = 6,
) -> DataFrame:
    """Per-document zlib compression ratio — the MassiveText/Gopher-era
    repetitiveness screen that catches what token statistics miss
    (templated boilerplate, keyword stuffing, near-repeated paragraphs
    compress far below natural prose): ``ratio = compressed_bytes /
    raw_bytes`` of the UTF-8 text, plus both byte counts and a
    ``low_entropy`` flag at the conventional 0.4 threshold. zlib with a
    fixed level is a DETERMINISTIC pure function of the bytes (stdlib,
    same output on every executor/platform), so the column is stable
    across runs and engines.

    This is genuinely Python-only compute (DEFLATE inside the JVM
    expression library doesn't exist), so it ships in the mandated
    vectorized form: ``mapInPandas`` over Arrow batches with one tight
    per-buffer loop (the extract_media_features shape — codecs take one
    buffer at a time; the loop is over materialized bytes inside a
    batch, never a row-at-a-time UDF round trip). Partition-preserving:
    zero shuffles, zero collects. No DuckDB oracle exists for DEFLATE,
    so the gate is rows-only (the kmeans_cells class); exactness is
    pinned by hand goldens instead.
    """
    import zlib as _zlib

    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
        BooleanType,
    )

    schema = StructType(
        [
            StructField(
                id_col, df.schema[id_col].dataType, True
            ),
            StructField("raw_bytes", LongType(), True),
            StructField("compressed_bytes", LongType(), True),
            StructField("ratio", DoubleType(), True),
            StructField("low_entropy", BooleanType(), True),
        ]
    )
    lvl = int(level)

    def batches(it):
        import pandas as pd

        for pdf in it:
            raw = pdf[text_col].fillna("").map(lambda s: s.encode("utf-8"))
            nraw = raw.map(len).astype("int64")
            ncmp = raw.map(
                lambda b: len(_zlib.compress(b, lvl))
            ).astype("int64")
            ratio = ncmp / nraw.where(nraw > 0, 1)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "raw_bytes": nraw,
                    "compressed_bytes": ncmp,
                    "ratio": ratio.round(6),
                    "low_entropy": ratio < 0.4,
                }
            )

    return df.select(id_col, text_col).mapInPandas(batches, schema=schema)


def gopher_rule_flags(
    text_col: str = "text",
    *,
    min_words: int = 20,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_punct_ratio: float = 0.2,
    min_alpha_word_ratio: float = 0.8,
    max_dup_word_ratio: float = 0.6,
) -> dict:
    """The five per-document Gopher rule predicates as boolean Columns
    (keys ``words/wlen/punct/alpha/dup`` plus ``all``) — shared by the
    per-source rollup below and the quality-classifier label
    (``operators/quality_model.py``), so both gates screen with
    byte-identical expressions. Every ratio is a quotient of exact
    integers, so the threshold comparisons are cross-engine exact."""
    from ..functions.text import normalize_text, tokens

    toks = tokens(normalize_text(F.col(text_col)))
    n_words = F.size(toks)
    nw_d = n_words.cast("double")
    mean_wlen = (
        F.length(F.regexp_replace(normalize_text(F.col(text_col)), r"[ \t\n\x0B\f\r]", ""))
        / F.greatest(nw_d, F.lit(1.0))
    )
    punct_ratio = (
        F.length(F.regexp_replace(F.col(text_col), r"[^!-/:-@\[-`{-~]", ""))
        / F.greatest(F.length(text_col).cast("double"), F.lit(1.0))
    )
    alpha_ratio = (
        F.size(F.filter(toks, lambda t: t.rlike("[a-z]"))).cast("double")
        / F.greatest(nw_d, F.lit(1.0))
    )
    dup_ratio = F.lit(1.0) - F.size(
        F.array_distinct(toks)
    ).cast("double") / F.greatest(nw_d, F.lit(1.0))
    r_words = n_words.between(min_words, max_words)
    r_wlen = (mean_wlen >= F.lit(min_mean_word_len)) & (
        mean_wlen <= F.lit(max_mean_word_len)
    )
    r_punct = punct_ratio <= F.lit(max_punct_ratio)
    r_alpha = alpha_ratio >= F.lit(min_alpha_word_ratio)
    r_dup = dup_ratio <= F.lit(max_dup_word_ratio)
    return {
        "words": r_words,
        "wlen": r_wlen,
        "punct": r_punct,
        "alpha": r_alpha,
        "dup": r_dup,
        "all": r_words & r_wlen & r_punct & r_alpha & r_dup,
    }


def gopher_quality_flags(
    docs: DataFrame,
    text_col: str = "text",
    source_col: str = "source",
    *,
    min_words: int = 20,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_punct_ratio: float = 0.2,
    min_alpha_word_ratio: float = 0.8,
    max_dup_word_ratio: float = 0.6,
) -> DataFrame:
    """Gopher/MassiveText-style repetition+shape rule screen
    (Rae et al. 2021 §A1.1; the rule family the reference's
    range-clamp cleaning P5 applies to demographics, applied to
    text): per-source pass counts for each rule plus the share of
    docs passing ALL rules.

    Rules (per doc, whitespace tokens): word count in
    [min_words, max_words]; mean word length in [3, 10]; punctuation
    ratio <= 0.2 of chars; share of words containing an alphabetic
    char >= 0.8; duplicate-word ratio (1 - distinct/total) <= 0.6.

    Shape: pure JVM column expressions per doc (array_distinct on the
    bounded token array, no explode), ONE hash agg by source — the
    same single-scan discipline as ``text_quality``. 100 TB story:
    map-side partials; output is |sources| rows.
    """
    r = gopher_rule_flags(
        text_col,
        min_words=min_words,
        max_words=max_words,
        min_mean_word_len=min_mean_word_len,
        max_mean_word_len=max_mean_word_len,
        max_punct_ratio=max_punct_ratio,
        min_alpha_word_ratio=min_alpha_word_ratio,
        max_dup_word_ratio=max_dup_word_ratio,
    )
    flags = docs.select(
        F.col(source_col).alias("source"),
        r["words"].cast("int").alias("f_words"),
        r["wlen"].cast("int").alias("f_wlen"),
        r["punct"].cast("int").alias("f_punct"),
        r["alpha"].cast("int").alias("f_alpha"),
        r["dup"].cast("int").alias("f_dup"),
        r["all"].cast("int").alias("f_all"),
    )
    return (
        flags.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("f_words").cast("bigint").alias("pass_word_count"),
            F.sum("f_wlen").cast("bigint").alias("pass_mean_word_len"),
            F.sum("f_punct").cast("bigint").alias("pass_punct_ratio"),
            F.sum("f_alpha").cast("bigint").alias("pass_alpha_words"),
            F.sum("f_dup").cast("bigint").alias("pass_dup_words"),
            F.sum("f_all").cast("bigint").alias("pass_all"),
            F.round(
                F.sum("f_all").cast("double") / F.count(F.lit(1)).cast("double"), 6
            ).alias("pass_all_share"),
        )
        .orderBy("source")
    )


def bpe_train_merges(
    df: DataFrame,
    text_col: str = "text",
    *,
    n_merges: int = 8,
    min_word_len: int = 2,
    max_word_len: int = 32,
    driver_max_vocab: int = 2_000_000,
) -> DataFrame:
    """FULL BPE merge-table training (the iterative step
    :func:`bpe_pair_counts` is one round of): run ``n_merges``
    greedy merges over the corpus vocabulary and emit the learned
    merge table → ``(merge_rank, left_sym, right_sym, merged,
    pair_count)`` — the artifact a tokenizer trainer persists
    (Sennrich et al. 2016, the algorithm behind GPT/Llama vocabs).

    Algorithm: words → symbol sequences (initially characters); each
    round counts adjacent symbol pairs WEIGHTED BY WORD FREQUENCY,
    merges the argmax pair (count DESC, then lexicographic — the
    deterministic tiebreak) into one symbol everywhere, repeats.
    Merging is greedy left-to-right non-overlapping within a word —
    implemented via literal string ``replace`` on a
    delimiter-encoded symbol string (``|a||b||c|``; pattern
    ``|a||b|`` → ``|ab|``), whose scan-ahead-after-replacement
    semantics are IDENTICAL in Python, Spark ``replace`` and DuckDB
    ``replace`` — so all three engines merge ``aaa`` the same way.
    Training is restricted to clean ``[a-z0-9]+`` words of length
    [min_word_len, max_word_len] (punctuation tokens carry no
    subword signal, and the charset guarantee keeps the delimiter
    encoding collision-free).

    Scale shape: pair statistics run on the DISTINCT-WORD table
    weighted by frequency, never the corpus — ONE corpus
    explode+shuffle builds (word, wf); every merge round then costs
    O(vocab) (Heaps-bounded, ≤ a few million rows at 100 TB). Below
    ``driver_max_vocab`` the rounds replay on the driver over the
    collected vocab (the k_core/_cc_driver discipline: a 100-round
    Python loop over ≤2M rows beats 100 tiny distributed jobs by
    orders of magnitude, and is hash-identical by construction);
    past it, the distributed loop iterates with per-round
    ``localCheckpoint`` lineage truncation and a 1-row argmax
    collect per round (the kmeans-centroid pattern).
    """
    from kkbox_churn_prediction_spark.functions.text import normalize_text, tokens

    words = (
        df.select(F.explode(tokens(normalize_text(F.col(text_col)))).alias("word"))
        .where(
            (F.length("word") >= min_word_len)
            & (F.length("word") <= max_word_len)
            & F.col("word").rlike("^[a-z0-9]+$")
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("wf"))
    )
    spark = df.sparkSession
    n_vocab = words.count()
    schema = (
        "merge_rank int, left_sym string, right_sym string, "
        "merged string, pair_count long"
    )
    if n_vocab <= driver_max_vocab:
        rows = words.collect()
        reps = [
            ("|" + "||".join(w["word"]) + "|", int(w["wf"])) for w in rows
        ]
        out = []
        for rank in range(1, n_merges + 1):
            counts: dict[tuple[str, str], int] = {}
            for rep, wf in reps:
                syms = rep[1:-1].split("||")
                for i in range(len(syms) - 1):
                    key = (syms[i], syms[i + 1])
                    counts[key] = counts.get(key, 0) + wf
            if not counts:
                break
            (a, b), c = min(
                counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
            )
            out.append((rank, a, b, a + b, c))
            pat, sub = f"|{a}||{b}|", f"|{a}{b}|"
            reps = [(rep.replace(pat, sub), wf) for rep, wf in reps]
        return spark.createDataFrame(out, schema)

    # distributed rounds: vocab-sized pair agg + 1-row argmax collect
    reps_df = words.select(
        F.concat(
            F.lit("|"),
            F.array_join(F.split(F.col("word"), ""), "||"),
            F.lit("|"),
        ).alias("rep"),
        "wf",
    ).persist()
    out = []
    for rank in range(1, n_merges + 1):
        syms = reps_df.select(
            F.split(F.expr("substr(rep, 2, length(rep) - 2)"), r"\|\|").alias("l"),
            "wf",
        )
        pairs = syms.select(
            F.explode(F.sequence(F.lit(1), F.size("l") - 1)).alias("i"),
            "l",
            "wf",
        ).select(
            F.col("l")[F.col("i") - 1].alias("a"),
            F.col("l")[F.col("i")].alias("b"),
            "wf",
        )
        best = (
            pairs.groupBy("a", "b")
            .agg(F.sum("wf").cast("long").alias("c"))
            .orderBy(F.desc("c"), "a", "b")
            .limit(1)
            .collect()
        )
        if not best:
            break
        a, b, c = best[0]["a"], best[0]["b"], best[0]["c"]
        out.append((rank, a, b, a + b, int(c)))
        nxt = reps_df.select(
            F.replace(
                F.col("rep"), F.lit(f"|{a}||{b}|"), F.lit(f"|{a}{b}|")
            ).alias("rep"),
            "wf",
        ).localCheckpoint(eager=True)
        reps_df.unpersist()
        reps_df = nxt
    reps_df.unpersist()
    return spark.createDataFrame(out, schema)


def bpe_apply_stats(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    *,
    min_word_len: int = 2,
    max_word_len: int = 32,
) -> DataFrame:
    """Apply a learned BPE merge table (the
    :func:`bpe_train_merges` artifact) to the corpus and report the
    compression it buys — the acceptance test of a tokenizer-vocab
    candidate BEFORE committing to it: ``tokens_per_word`` after k
    merges vs the character baseline, corpus-weighted. Output: ONE
    row — ``(n_words, n_chars, n_tokens, chars_per_word,
    tokens_per_word, compression_vs_chars)``.

    Encoding applies the merges IN TRAINING ORDER as a chain of
    literal ``replace`` column expressions over the delimiter-encoded
    word (the exact construction training used, so train→apply
    round-trips bit-identically) — k merges = k JVM string ops per
    distinct word, zero Python, zero extra shuffles. Token counts
    come from the delimiter arithmetic ``(len(rep) −
    len(replace(rep, '|', ''))) / 2 − 1`` (each token adds one
    ``|...|`` pair) — no split/explode needed. Stats are
    frequency-weighted over the DISTINCT-WORD table (the training
    scale shape: O(vocab) work after one corpus pass).
    """
    from kkbox_churn_prediction_spark.functions.text import normalize_text, tokens

    words = (
        df.select(F.explode(tokens(normalize_text(F.col(text_col)))).alias("word"))
        .where(
            (F.length("word") >= min_word_len)
            & (F.length("word") <= max_word_len)
            & F.col("word").rlike("^[a-z0-9]+$")
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("wf"))
    )
    rep: Column = F.concat(
        F.lit("|"), F.array_join(F.split(F.col("word"), ""), "||"), F.lit("|")
    )
    for a, b in merges:
        rep = F.replace(rep, F.lit(f"|{a}||{b}|"), F.lit(f"|{a}{b}|"))
    n_tokens = (
        (F.length(rep) - F.length(F.replace(rep, F.lit("|"), F.lit("")))) / 2
    ).cast("long")
    per = words.select(
        "wf",
        F.length("word").cast("long").alias("_chars"),
        n_tokens.alias("_toks"),
    )
    out = per.agg(
        F.sum("wf").cast("long").alias("n_words"),
        F.sum(F.col("wf") * F.col("_chars")).cast("long").alias("n_chars"),
        F.sum(F.col("wf") * F.col("_toks")).cast("long").alias("n_tokens"),
    )
    nw = F.col("n_words").cast("double")
    return out.select(
        "n_words",
        "n_chars",
        "n_tokens",
        F.round(F.col("n_chars") / nw, 6).alias("chars_per_word"),
        F.round(F.col("n_tokens") / nw, 6).alias("tokens_per_word"),
        F.round(
            F.lit(1.0) - F.col("n_tokens") / F.col("n_chars").cast("double"), 6
        ).alias("compression_vs_chars"),
    )



def encoding_quality(
    df: DataFrame,
    text_col: str = "text",
    source_col: str | None = None,
) -> DataFrame:
    """Encoding-health screen per source: the corpus-poisoning
    defects that slip past language-ID and quality scores because
    they are CHARACTER-level, not word-level — U+FFFD replacement
    characters (upstream decode already failed), C0 control
    characters (binary spillover), the double-decode mojibake
    signature (UTF-8 read as Latin-1: U+00C3 followed by a
    Latin-1-supplement byte), and the non-ASCII share (legitimate
    for most languages, but a sudden jump inside an ASCII source is
    a pipeline defect). Output per source: ``(source, n_docs,
    repl_char_docs, mojibake_docs, control_char_rate,
    non_ascii_rate)``.

    Shape: pure JVM regexp/length expressions per row + ONE hash
    agg; rates are exact integer char-count ratios.
    """
    src = (
        F.col(source_col)
        if source_col is not None
        else F.lit("all").alias("source")
    )
    t = F.col(text_col)
    n_chars = F.length(t).cast("long")
    n_control = (
        F.length(t)
        - F.length(
            F.regexp_replace(t, "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f]", "")
        )
    ).cast("long")
    n_non_ascii = (
        F.length(t) - F.length(F.regexp_replace(t, "[^\\x00-\\x7f]", ""))
    ).cast("long")
    has_repl = t.contains("\ufffd").cast("int")
    has_mojibake = t.rlike("\u00c3[\u0080-\u00bf\u00c0-\u00ff]").cast("int")
    per = df.where(t.isNotNull()).select(
        src.alias("source"),
        n_chars.alias("_nc"),
        n_control.alias("_ctl"),
        n_non_ascii.alias("_na"),
        has_repl.alias("_repl"),
        has_mojibake.alias("_moji"),
    )
    return (
        per.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("_repl").cast("long").alias("repl_char_docs"),
            F.sum("_moji").cast("long").alias("mojibake_docs"),
            F.round(
                F.sum("_ctl").cast("double")
                / F.greatest(F.sum("_nc"), F.lit(1)).cast("double"),
                6,
            ).alias("control_char_rate"),
            F.round(
                F.sum("_na").cast("double")
                / F.greatest(F.sum("_nc"), F.lit(1)).cast("double"),
                6,
            ).alias("non_ascii_rate"),
        )
        .orderBy("source")
    )
