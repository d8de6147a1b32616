"""Text analysis operators: stats, language-ID, token counting, quality.

All native Spark array / higher-order / regex functions — the hot path
never enters Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from etl_batch_spark.llmops.dedup import tokens

# BPE-ish lexer: letter runs, digit runs, single punctuation.  The Spark
# variant is double-escaped (passes through a SQL string literal).
TOK_RE_SPARK = "[a-z]+|[0-9]+|[^a-z0-9\\\\s]"

STOPWORDS = {
    "en": ("the", "a", "of", "and", "is", "to", "in"),
    "fr": ("le", "la", "et", "de", "un", "une", "est"),
    "de": ("der", "die", "das", "und", "ist", "ein"),
}


def text_stats(df: DataFrame, *, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, n_tokens, n_uniq, ttr, avg_token_len) per document."""
    d = df.withColumn("toks", tokens(text_col))
    n_tokens = F.size("toks").cast("long")
    n_uniq = F.size(F.array_distinct("toks")).cast("long")
    total_len = F.expr("aggregate(toks, 0L, (acc, x) -> acc + length(x))")
    denom = F.nullif(n_tokens, F.lit(0)).cast("double")
    return d.select(
        id_col,
        n_tokens.alias("n_tokens"),
        n_uniq.alias("n_uniq"),
        F.round(n_uniq / denom, 4).alias("ttr"),
        F.round(total_len / denom, 4).alias("avg_token_len"),
    )


def _stop_count(lang: str) -> Column:
    words = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
    return F.expr(f"size(filter(toks, x -> x IN ({words})))")


def lang_scores(df: DataFrame, *, text_col: str = "text") -> DataFrame:
    """Adds per-language stopword-vote columns (<lang>_n) + toks."""
    d = df.withColumn("toks", tokens(text_col))
    for lang in STOPWORDS:
        d = d.withColumn(f"{lang}_n", _stop_count(lang))
    return d


def lang_pred_col() -> Column:
    """Argmax with deterministic preference order en > fr > de."""
    return (
        F.when(
            (F.col("en_n") >= F.col("fr_n")) & (F.col("en_n") >= F.col("de_n")) & (F.col("en_n") > 0),
            "en",
        )
        .when((F.col("fr_n") >= F.col("de_n")) & (F.col("fr_n") > 0), "fr")
        .when(F.col("de_n") > 0, "de")
        .otherwise("unknown")
    )


def token_counts(df: DataFrame, *, text_col: str = "text") -> DataFrame:
    """Adds ws_tokens (whitespace) and bpe_tokens (regex lexer) columns."""
    d = df.withColumn("toks", tokens(text_col))
    bpe = F.expr(f"size(regexp_extract_all(lower({text_col}), '{TOK_RE_SPARK}', 0))").cast("long")
    return d.withColumn("ws_tokens", F.size("toks").cast("long")).withColumn("bpe_tokens", bpe)


def quality_column(text_col: str = "text", toks_col: str = "toks") -> Column:
    """The quality-score column over a pre-tokenized row — exposed so
    multi-consumer pipelines (pipe03/pipe04) can compute it in the same
    projection that materializes the token array, instead of paying a
    second tokenize pass and a join back on id."""
    n_tokens = F.size(toks_col)
    diversity = F.size(F.array_distinct(toks_col)) / F.nullif(n_tokens, F.lit(0)).cast(
        "double"
    )
    alpha = F.length(F.regexp_replace(F.lower(text_col), "[^a-z]", "")) / F.nullif(
        F.length(text_col), F.lit(0)
    ).cast("double")
    quality = 0.4 * F.least(F.lit(1.0), n_tokens / F.lit(100.0)) + 0.3 * diversity + 0.3 * alpha
    # +1e-9 before rounding: the weights make exact .xxxx5 values common
    # (e.g. 0.53275), and engines disagree on double half-boundaries
    # (decimal-string HALF_UP vs raw-double compare).  The nudge pushes
    # boundary values consistently up on every engine and is far below
    # the score's meaningful resolution.
    return F.round(quality + F.lit(1e-9), 4)


def quality_score(df: DataFrame, *, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, quality): length saturation + lexical diversity + alphabetic
    purity — the standard pretraining-data quality triple."""
    d = df.withColumn("toks", tokens(text_col))
    return d.select(id_col, quality_column(text_col, "toks").alias("quality"))


def winnow_fingerprints(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    w: int = 4,
) -> DataFrame:
    """Document fingerprints by winnowing (Schleimer/Wilkerson/Aiken,
    SIGMOD'03): hash every word ``k``-gram in positional order, then keep
    the minimum hash of each sliding window of ``w`` consecutive k-gram
    hashes.  Any shared run of ≥ w+k-1 tokens between two documents is
    guaranteed to share a fingerprint, so plagiarism/containment
    detection becomes an equi-join on (fingerprint) — the same
    linear-shuffle shape as the other dedup operators, with a corpus-
    size-independent ~1/w sampling of positions per document.

    Entirely per-row higher-order functions (order-preserving, unlike
    the set-shaped :func:`~etl_batch_spark.llmops.dedup.shingle_sets`);
    output is the distinct (id, fingerprint) table.  Documents with
    fewer than k tokens have no fingerprints; those with fewer than w
    k-grams contribute their single minimum (standard fallback).
    """
    from etl_batch_spark.catalog import fan_out
    from etl_batch_spark.llmops.dedup import H60

    gram = " , ".join(f"toks[i+{j}]" for j in range(k))
    h = H60.format(expr=f"concat_ws(' ', {gram})")
    hs = f"transform(sequence(0, size(toks) - {k}), i -> {h})"
    fps = (
        f"case when size(hs) >= {w} then "
        f"array_distinct(transform(sequence(0, size(hs) - {w}), i -> array_min(slice(hs, i + 1, {w})))) "
        "else array(array_min(hs)) end"
    )
    return (
        fan_out(df)
        .withColumn("toks", tokens(text_col))
        .filter(F.size("toks") >= k)
        .withColumn("hs", F.expr(hs))
        .select(id_col, F.explode(F.expr(fps)).alias("fingerprint"))
    )


# Redaction patterns, applied in order.  Kept RE2-compatible (no
# backrefs/lookaround) so the same patterns run in DuckDB/Trino oracles.
REDACTIONS: tuple[tuple[str, str, str], ...] = (
    ("email", "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}", "<EMAIL>"),
    ("url", "https?://[^\\s]+", "<URL>"),
    ("long_digits", "[0-9]{6,}", "<NUM>"),
)


def redact(df: DataFrame, *, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, clean_text, n_redactions): scrub emails / URLs / long digit
    runs — the standard pre-training hygiene pass.  Pure
    ``regexp_replace`` chain, JVM-side; n_redactions is measured from
    the marker count so filtering 'heavily redacted' docs needs no
    second pass."""
    clean = F.col(text_col)
    for _, pattern, marker in REDACTIONS:
        clean = F.regexp_replace(clean, pattern, marker)
    d = df.select(F.col(id_col), clean.alias("clean_text"))
    n = sum(
        (F.size(F.split(F.col("clean_text"), F.lit(marker), -1)) - 1)
        for _, _, marker in REDACTIONS
    )
    return d.select(id_col, "clean_text", n.cast("long").alias("n_redactions"))


def ngram_repetition(
    df: DataFrame, *, id_col: str = "doc_id", text_col: str = "text", n: int = 2
) -> DataFrame:
    """(id, n_grams, dup_gram_frac, top_gram_frac) — the Gopher-style
    repetition signals (Rae et al. 2021 §A1.1): fraction of duplicated
    word n-grams and the share held by the single most frequent one.

    One shuffle on (doc, gram) does all three aggregates map-side-
    partial; no per-row O(len²) scan, so pathological repeated docs
    cost the same as clean ones.  Documents shorter than ``n`` tokens
    have no n-grams and drop out (consistent with the SQL twin).
    """
    from etl_batch_spark.catalog import fan_out
    from etl_batch_spark.llmops.dedup import shingle_array, tokens

    grams = (
        fan_out(df).withColumn("toks", tokens(text_col))
        .select(id_col, F.explode(shingle_array("toks", n=n)).alias("gram"))
    )
    per_gram = grams.groupBy(id_col, "gram").agg(F.count(F.lit(1)).alias("c"))
    total = F.sum("c").cast("double")
    # +1e-9 before rounding: same half-boundary determinism nudge as
    # quality_score — ratios of small integers can land exactly on
    # .xxxx5 where engines round double halves differently.
    return per_gram.groupBy(id_col).agg(
        F.sum("c").cast("long").alias("n_grams"),
        F.round(1 - F.count(F.lit(1)) / total + F.lit(1e-9), 4).alias(
            "dup_gram_frac"
        ),
        F.round(F.max("c") / total + F.lit(1e-9), 4).alias("top_gram_frac"),
    )


def token_entropy(
    df: DataFrame, *, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, n_tokens, entropy) — Shannon entropy (nats) of the token
    distribution, a cheap gibberish/boilerplate signal: near-zero for
    pathologically repetitive docs, ~ln(vocab) for diverse ones.

    H = ln(N) - Σ c·ln(c) / N over per-token counts c: one shuffle on
    (doc, token), then a partial-aggregated fold per doc.
    """
    from etl_batch_spark.catalog import fan_out
    from etl_batch_spark.llmops.dedup import tokens

    toks = (
        fan_out(df).withColumn("toks", tokens(text_col))
        .select(id_col, F.explode("toks").alias("tok"))
    )
    counts = toks.groupBy(id_col, "tok").agg(F.count(F.lit(1)).alias("c"))
    n = F.sum("c").cast("double")
    return counts.groupBy(id_col).agg(
        F.sum("c").cast("long").alias("n_tokens"),
        F.round(
            F.log(n) - F.sum(F.col("c") * F.log("c")) / n + F.lit(1e-9), 4
        ).alias("entropy"),
    )


def bigram_lm_score(
    df: DataFrame, *, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Self-scored bigram language-model fluency — the KenLM-perplexity
    quality signal (CCNet / Gopher filtering) without an external model:
    the corpus IS the LM.  Per doc: ``(n_bigrams, sum_logp_centi,
    avg_logp)`` where each bigram contributes Laplace-smoothed
    ``log10((c12 + 1) / (c1 + V))`` against corpus-wide counts.  Fluent,
    common-phrase text scores high; gibberish and boilerplate-with-rare-
    token-soup score low.

    Cross-engine determinism: each bigram's log-prob is integerized to
    centi units BEFORE aggregation, so the per-doc SUM is an exact
    integer in any aggregation order (same discipline as pq_topk's
    micro-unit distances); ``avg_logp`` is derived from those exact ints.

    Distributed shape: counts are two partial-aggregating groupBys over
    the exploded bigram stream; scoring joins the stream back on the
    bigram key — shuffles linear in token count, and V is one broadcast
    scalar.  At 100 TB you'd prune the LM to its top-V bigrams and
    broadcast it; the scoring join is unchanged.
    """
    from etl_batch_spark.catalog import fan_out
    from etl_batch_spark.llmops.dedup import tokens

    toks = (
        fan_out(df)
        .withColumn("toks", tokens(text_col))
        .filter(F.size("toks") >= 2)
    )
    bg = toks.select(
        id_col,
        F.explode(
            F.expr(
                "transform(sequence(0, size(toks) - 2), "
                "i -> struct(toks[i] as w1, toks[i+1] as w2))"
            )
        ).alias("b"),
    ).select(id_col, "b.w1", "b.w2")
    c2 = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    c1 = bg.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    vocab = toks.select(F.explode("toks").alias("tok")).agg(
        F.countDistinct("tok").alias("v")
    )
    logp_centi = F.round(
        (
            F.log10((F.col("c12") + 1).cast("double"))
            - F.log10((F.col("c1") + F.col("v")).cast("double"))
        )
        * 100,
        0,
    ).cast("long")
    scored = (
        bg.join(c2, ["w1", "w2"])
        .join(c1, ["w1"])
        .crossJoin(F.broadcast(vocab))
        .withColumn("logp_centi", logp_centi)
    )
    return (
        scored.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum("logp_centi").alias("sum_logp_centi"),
        )
        .withColumn(
            "avg_logp",
            F.round(F.col("sum_logp_centi") / 100.0 / F.col("n_bigrams"), 3),
        )
    )


def contamination(
    train: DataFrame,
    bench: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 4,
    train_toks_col: "str | None" = None,
) -> DataFrame:
    """Benchmark decontamination: per training doc, how many distinct
    word ``n``-grams it shares with the held-out ``bench`` corpus and
    how many bench docs it collides with (the standard n-gram-overlap
    test-set leak check, cf. GPT-3 appx C / PaLM §8).

    Both sides reduce to *distinct* (doc, gram) pairs built row-local
    (tokenize → shingle → array_distinct → explode), so the join key is
    the gram: shuffles stay linear and the bench side — eval sets are
    tiny next to training corpora — broadcasts.

    ``train_toks_col`` names an already-tokenized train-side column
    (the pipe01 checkpointed corpus) — skips this pass's re-tokenize.
    """
    from etl_batch_spark.llmops.dedup import shingle_sets

    t = shingle_sets(
        train, id_col=id_col, text_col=text_col, n=n, toks_col=train_toks_col
    ).select(F.col(id_col), F.explode("sh").alias("gram"))
    b = shingle_sets(bench, id_col=id_col, text_col=text_col, n=n).select(
        F.col(id_col).alias("bench_id"), F.explode("sh").alias("gram")
    )
    return (
        t.join(F.broadcast(b), "gram")
        .groupBy(id_col)
        .agg(
            F.countDistinct("gram").alias("n_shared_grams"),
            F.countDistinct("bench_id").alias("n_bench_docs"),
        )
    )


def pack_chunks(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    part_col: str = "source",
    order_col: str = "doc_id",
    text_col: str = "text",
    capacity: int = 512,
) -> DataFrame:
    """Concat-and-chunk sequence packing: documents are concatenated in
    ``order_col`` order within each ``part_col`` stream and split into
    fixed ``capacity``-token training chunks (the GPT-style packing
    layout).  Emits each doc's span: (doc, part, n_tokens, chunk_start,
    chunk_end) — a doc crossing a boundary spans several chunks.

    Pure integer window math: one shuffle+sort per stream, no Python.
    At 100 TB the stream key keeps state bounded per partition; skewed
    sources can be pre-split by a salted sub-stream key upstream.
    """
    from pyspark.sql import Window
    from etl_batch_spark.llmops.dedup import tokens

    d = df.withColumn("n_tokens", F.size(tokens(text_col)).cast("long"))
    w = (
        Window.partitionBy(part_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    offset = F.sum("n_tokens").over(w) - F.col("n_tokens")
    return d.select(
        id_col,
        part_col,
        "n_tokens",
        F.floor(offset / capacity).cast("long").alias("chunk_start"),
        # greatest(n,1): a zero-token doc's span is (start, start), never
        # the inverted (start, start-1) the raw n-1 arithmetic produces
        F.floor((offset + F.greatest(F.col("n_tokens"), F.lit(1)) - 1) / capacity)
        .cast("long")
        .alias("chunk_end"),
    )


def pack_nextfit(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    capacity: int = 256,
    n_shards: int = 4,
    salt: str = "pack",
    n_tok_col: "str | None" = None,
) -> DataFrame:
    """Next-fit-DECREASING bin packing: ``(id, shard, n_tok, bin,
    fill_after)`` — whole-document packing into fixed-capacity training
    bins without splitting documents (the padding-free alternative to
    :func:`pack_chunks`, which splits documents across chunk
    boundaries; use this when attention must never cross a document
    boundary).  Docs longer than ``capacity`` get a bin of their own.

    Within each hash shard, docs sort by (tokens DESC, id) and a
    sequential walk keeps filling the CURRENT bin until a doc doesn't
    fit, then opens the next — state is one (bin, fill) pair, so the
    walk replays exactly as a per-shard recursive CTE (the oracle), the
    et22/ss07 discipline for sequential operators.

    Distributed shape: the sequential part runs per shard inside
    ``applyInPandas`` — at 100 TB raise ``n_shards`` so one shard's doc
    list fits a task comfortably (packing quality is per-shard NFD
    either way; shard count trades global optimality nobody needs for
    unbounded parallelism).  Everything before it is one hash, no
    shuffle beyond the shard groupBy.
    """
    import pandas as pd
    from pyspark.sql.types import (
        IntegerType,
        LongType,
        StructField,
        StructType,
    )

    from etl_batch_spark.catalog import fan_out
    from etl_batch_spark.llmops.dedup import H60, tokens

    h = H60.format(expr=f"concat('{salt}', '|', cast({id_col} as string))")
    shard = F.expr(f"pmod({h}, {n_shards})").cast("int").alias("shard")
    if n_tok_col is not None:
        # pre-counted tokens (a pipeline that tokenized once upstream —
        # pipe04's checkpointed corpus): NULL n_tok ≡ NULL text (size of
        # a NULL token array is NULL), so the skip rule is unchanged and
        # the heavy per-row tokenize pass never re-runs here
        prepped = df.filter(F.col(n_tok_col).isNotNull()).select(
            F.col(id_col),
            F.col(n_tok_col).cast("long").alias("n_tok"),
            shard,
        )
    else:
        # a NULL text has no token count: it cannot be placed in a bin
        # (and a NaN n_tok would crash the per-shard walk) — skip it
        prepped = (
            fan_out(df.filter(F.col(text_col).isNotNull()))
            .select(
                F.col(id_col),
                F.size(tokens(text_col)).cast("long").alias("n_tok"),
                shard,
            )
        )

    # output id column named and typed after id_col — the pandas walk
    # must honor the parameter too, not a hardcoded 'doc_id'
    out_schema = StructType(
        [
            StructField(id_col, df.schema[id_col].dataType),
            StructField("shard", IntegerType()),
            StructField("n_tok", LongType()),
            StructField("bin", IntegerType()),
            StructField("fill_after", LongType()),
        ]
    )

    def walk(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["n_tok", id_col], ascending=[False, True])
        bins, fills = [], []
        cur_bin, fill = 0, 0
        for n in pdf["n_tok"]:
            if cur_bin == 0 or fill + n > capacity:
                cur_bin += 1
                fill = int(n)
            else:
                fill += int(n)
            bins.append(cur_bin)
            fills.append(fill)
        return pd.DataFrame(
            {
                id_col: pdf[id_col].to_numpy(),
                "shard": pdf["shard"].to_numpy(),
                "n_tok": pdf["n_tok"].to_numpy(),
                "bin": pd.array(bins, dtype="int32"),
                "fill_after": pd.array(fills, dtype="int64"),
            }
        )

    return prepped.groupBy("shard").applyInPandas(walk, schema=out_schema)


def score_batch(df: DataFrame, *, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, score): a quality-classifier forward pass as an Arrow-batched
    pandas UDF — the inference plumbing (featurize → vectorized model →
    score column) that a real ONNX/sklearn classifier slots into by
    replacing ``_logistic`` only.

    The model here is a fixed logistic regression over three cheap
    features (clamped char count, clamped whitespace-token count, digit
    ratio) so the oracle can replay it exactly; weights are frozen
    constants.  Scale shape: ``mapInPandas`` streams Arrow batches —
    no per-row Python, no collect, model state broadcast by closure
    (a real model would load once per executor via a lazy global).
    """
    schema = f"{id_col} long, score double"

    def _logistic(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            # NULL text -> NULL score: a model cannot infer on missing
            # input, and fillna('') would fabricate the empty-string
            # score for it (0.182426 — a silent constant)
            missing = pdf[text_col].isna().to_numpy()
            txt = pdf[text_col].fillna("")
            n_chars = txt.str.len().clip(upper=2000)
            # explicit ASCII whitespace class (= Java regex \s), NOT
            # pandas .split(): Python's no-arg split is Unicode-aware
            # (NBSP, ideographic space, …) where the engine-wide token
            # contract — F.split on \s+ in the JVM operators — is ASCII
            n_tok = (
                txt.str.findall(r"[^ \t\n\r\f\x0b]+").str.len().clip(upper=400)
            )
            digits = txt.str.count(r"[0-9]")
            ratio = digits / np.maximum(txt.str.len(), 1)
            z = -1.5 + 0.004 * n_chars + 0.02 * n_tok - 2.0 * ratio
            out = pdf[[id_col]].copy()
            score = (1.0 / (1.0 + np.exp(-z))).round(6)
            out["score"] = pd.array(
                np.where(missing, np.nan, score), dtype="Float64"
            )
            out.loc[missing, "score"] = pd.NA
            yield out

    return df.select(id_col, text_col).mapInPandas(_logistic, schema=schema)


def bm25_topk(
    df: DataFrame,
    query_terms: "list[str]",
    *,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Okapi BM25 keyword search: top-``k`` documents for a bag of query
    terms; (id, score) with Lucene's idf = ln(1 + (N-df+.5)/(df+.5)).

    Scale shape: tokens are filtered to the query terms BEFORE the
    (doc, term) shuffle, so shuffle volume is proportional to query-term
    hits, not corpus size; doc length rides through the explode (no
    join back to raw); corpus stats (N, avgdl) and per-term df are
    one-row / |terms|-row broadcasts; top-k is TakeOrdered, never a
    global sort.  At 100 TB an inverted-index pre-build amortizes
    repeated queries, but a single scan like this is the right cold
    path.
    """
    from etl_batch_spark.catalog import fan_out
    from etl_batch_spark.llmops.dedup import tokens

    terms = F.array(*[F.lit(t) for t in query_terms])
    # ONE corpus pass: tokenize once into (id, dl, query-term hits) —
    # a shuffle-volume-sized projection — and localCheckpoint it so the
    # corpus stats (n_docs, avgdl) and the tf stream both read it
    # instead of re-scanning + re-tokenizing the raw corpus (the old
    # form carried three full-corpus tokenization passes).
    base = (
        fan_out(df)
        .select(F.col(id_col), tokens(text_col).alias("toks"))
        .select(
            id_col,
            F.size("toks").cast("double").alias("dl"),
            F.filter("toks", lambda t: F.array_contains(terms, t)).alias("hits"),
        )
        .localCheckpoint(eager=False)
    )
    # NOTE (round 10): a row-local tf form (per-row transform over
    # array_distinct(hits), no (doc, term) exchange) was tried and
    # REVERTED — under duplicate-ingested doc_ids the groupBy is
    # load-bearing: tf must count occurrences across ALL copies of a
    # doc and df must count each doc once, which the per-row form gets
    # wrong (caught by the t76 ties+dups stress corpus).
    toked = base.select(
        id_col, "dl", F.explode("hits").alias("term")
    )
    # materialized once (round 11): both the scoring join AND the
    # per-term document frequency consume tf, and without the
    # checkpoint the dfreq branch replayed the whole explode +
    # (doc, term) aggregation over the corpus checkpoint (two of the
    # r10 plan's five exchanges were that duplicate).  tf is bounded by
    # query-term HITS — |terms|·matching docs, tiny relative to the
    # corpus at any scale.
    tf = (
        toked.groupBy(id_col, "term")
        .agg(
            F.count(F.lit(1)).cast("double").alias("tf"),
            F.first("dl").alias("dl"),
        )
        .localCheckpoint(eager=False)
    )
    corpus = base.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).cast("double").alias("df"))
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(corpus))
        .withColumn(
            "idf",
            F.log(
                F.lit(1.0)
                + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
            ),
        )
        .withColumn(
            "contrib",
            F.col("idf")
            * F.col("tf")
            * F.lit(k1 + 1.0)
            / (
                F.col("tf")
                + F.lit(k1)
                * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
            ),
        )
        .groupBy(id_col)
        .agg(F.round(F.sum("contrib"), 6).alias("score"))
    )
    return scored.orderBy(F.desc("score"), F.asc(id_col)).limit(k)


def chunk_tokens(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    size: int = 32,
    stride: int = 24,
    keep_cols: "tuple[str, ...]" = (),
) -> DataFrame:
    """Sliding-window token chunks: (id, chunk_idx, n_tokens,
    chunk_text[, keep_cols...]) — one row per window of ``size`` tokens
    every ``stride`` (overlap = size - stride).  Pure higher-order
    array expressions: a narrow, shuffle-free row expansion whose
    output multiplies rows by ~n_tokens/stride.
    """
    from etl_batch_spark.llmops.dedup import tokens

    d = df.select(id_col, *keep_cols, tokens(text_col).alias("toks"))
    n = F.size("toks")
    starts = d.filter(n > 0).select(
        id_col,
        *keep_cols,
        "toks",
        F.explode(F.sequence(F.lit(0), n - 1, F.lit(stride))).alias("start"),
    )
    # drop windows fully contained in their predecessor: once a window
    # reaches the end of the doc, later starts add no new tokens and
    # would duplicate training text verbatim
    starts = starts.filter(
        (F.col("start") == 0) | (F.col("start") - stride + size < F.size("toks"))
    )
    return starts.select(
        id_col,
        *keep_cols,
        (F.col("start") / stride).cast("int").alias("chunk_idx"),
        F.least(F.lit(size), F.size("toks") - F.col("start")).cast("int").alias("n_tokens"),
        F.array_join(F.slice("toks", F.col("start") + 1, size), " ").alias("chunk_text"),
    )


def feature_hash(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_features: int = 64,
) -> DataFrame:
    """Hashing-trick featurizer (Weinberger et al., ICML 2009): sparse
    bag-of-tokens vectors in a FIXED ``n_features``-dim space, long-form
    ``(id, feature, tf, signed_tf)``.

    No vocabulary pass, no fit state: the feature index is
    ``h(token) mod n_features`` and a second hash bit supplies the ±1
    sign that keeps hashed inner products unbiased under collisions —
    the property that lets a linear model train on 100 TB without ever
    materializing (or shipping) a dictionary.  One explode + one
    partial-aggregated groupBy, both linear; md5-derived hashes keep the
    vectors bit-identical across engines.
    """
    from etl_batch_spark.llmops.dedup import H60, tokens

    toks = df.select(id_col, F.explode(tokens(text_col)).alias("tok"))
    feat = (F.expr(H60.format(expr="tok")) % n_features).alias("feature")
    sign = (
        F.when(
            F.expr("cast(conv(substr(md5(tok), 16, 1), 16, 10) as int)") % 2 == 0, 1
        ).otherwise(-1)
    )
    return (
        toks.groupBy(id_col, feat)
        .agg(
            F.count(F.lit(1)).alias("tf"),
            F.sum(sign).alias("signed_tf"),
        )
    )


def gopher_rules(
    df: DataFrame, *, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """The published Gopher quality-rule set (Rae et al. 2021, App. A)
    as one native-expression pass — the standard pretraining heuristic
    filter, emitted with per-rule evidence columns so curation can
    report WHY a document fell, not just that it fell:

    - 50 <= word count <= 100,000
    - 3 <= mean word length <= 10
    - symbol-to-word ratio ('#' or '…') <= 0.1
    - <= 90% of lines start with a bullet; <= 30% end with an ellipsis
    - >= 80% of words contain an alphabetic character
    - >= 2 of the 8 English function words present
      (the/be/to/of/and/that/have/with)

    All ratios are single int/int double divisions (IEEE-identical on
    any engine, no rounding needed).  ``keep`` is False for documents
    too short to evaluate (n_words < 50 fails rule 1 before any ratio
    can go NULL).  One scan, zero shuffles, zero Python.
    """
    d = df.withColumn("toks", tokens(text_col)).withColumn(
        "lines", F.split(F.col(text_col), "\n")
    )
    n_words = F.size("toks").cast("long")
    denom = F.nullif(n_words, F.lit(0)).cast("double")
    mean_len = F.expr("aggregate(toks, 0L, (acc, x) -> acc + length(x))") / denom
    n_sym = (
        F.length(text_col) - F.length(F.replace(text_col, F.lit("#"), F.lit("")))
        + F.length(text_col) - F.length(F.replace(text_col, F.lit("…"), F.lit("")))
    )
    symbol_ratio = n_sym / denom
    n_lines = F.nullif(F.size("lines"), F.lit(0)).cast("double")
    bullet_frac = (
        F.expr("size(filter(lines, x -> left(ltrim(x), 1) IN ('•', '-', '*')))")
        / n_lines
    )
    ellipsis_frac = (
        F.expr("size(filter(lines, x -> endswith(x, '...') OR endswith(x, '…')))")
        / n_lines
    )
    alpha_frac = F.expr("size(filter(toks, x -> x rlike '[a-z]'))") / denom
    stop_hits = sum(
        F.array_contains("toks", w).cast("int")
        for w in ("the", "be", "to", "of", "and", "that", "have", "with")
    ).cast("int")
    keep = (
        n_words.between(50, 100_000)
        & mean_len.between(3.0, 10.0)
        & (symbol_ratio <= 0.1)
        & (bullet_frac <= 0.9)
        & (ellipsis_frac <= 0.3)
        & (alpha_frac >= 0.8)
        & (stop_hits >= 2)
    )
    return d.select(
        id_col,
        n_words.alias("n_words"),
        mean_len.alias("mean_word_len"),
        symbol_ratio.alias("symbol_ratio"),
        bullet_frac.alias("bullet_frac"),
        ellipsis_frac.alias("ellipsis_frac"),
        alpha_frac.alias("alpha_frac"),
        stop_hits.alias("n_stop_hits"),
        F.coalesce(keep, F.lit(False)).alias("keep"),
    )


# ---------------------------------------------------------------------------
# URL curation (crawl-pipeline staple: CCNet / RefinedWeb / FineWeb
# dedupe by normalized URL and cap per-domain document counts).  Both
# functions are pure native column expressions built on Spark's
# parse_url — zero Python in the hot path; at 100 TB this runs at scan
# speed inside whole-stage codegen.
# ---------------------------------------------------------------------------

# query params that identify a click, not a resource (the usual strip
# set: Google/Facebook/Microsoft click ids + utm_* campaign tags).
# Case-insensitive and valueless-param tolerant: '?UTM_SOURCE=x',
# '?Gclid=1' and a bare '?fbclid' must all canonicalize away or the
# same resource escapes URL dedup under trivially-varied tracking tags.
_TRACKING_PARAM_RE = "(?i)^(utm_[a-z]+|gclid|fbclid|msclkid|mc_eid)(=|$)"



def normalize_url(url: Column) -> Column:
    """Canonical URL: lowercase scheme+host, strip ``www.``, drop the
    fragment, drop the default port (80/http, 443/https — explicit
    non-default ports survive), strip one trailing slash from the path,
    and remove tracking query params (``utm_*``/click ids) while
    preserving the order of the rest.  NULL/unparseable URLs stay NULL
    (parse_url semantics)."""
    proto = F.lower(F.parse_url(url, F.lit("PROTOCOL")))
    host = F.lower(F.parse_url(url, F.lit("HOST")))
    host = F.regexp_replace(host, r"^www\.", "")
    authority = F.parse_url(url, F.lit("AUTHORITY"))
    port = F.regexp_extract(authority, r":(\d+)$", 1)
    default_port = F.when(proto == "http", F.lit("80")).when(
        proto == "https", F.lit("443")
    ).otherwise(F.lit(""))
    port_part = F.when(
        (port == "") | (port == default_port), F.lit("")
    ).otherwise(F.concat(F.lit(":"), port))
    path = F.parse_url(url, F.lit("PATH"))
    path = F.regexp_replace(path, r"/$", "")
    query = F.parse_url(url, F.lit("QUERY"))
    kept = F.array_join(
        F.filter(
            F.split(F.coalesce(query, F.lit("")), "&"),
            lambda p: (p != "") & ~p.rlike(_TRACKING_PARAM_RE),
        ),
        "&",
    )
    query_part = F.when(kept == "", F.lit("")).otherwise(
        F.concat(F.lit("?"), kept)
    )
    return F.when(
        proto.isNull() | host.isNull(), F.lit(None).cast("string")
    ).otherwise(
        F.concat(proto, F.lit("://"), host, port_part,
                 F.coalesce(path, F.lit("")), query_part)
    )


def registered_domain(host: Column) -> Column:
    """eTLD+1 from a hostname under the FULL Public Suffix List
    (https://publicsuffix.org/list/ — the vendored Mozilla list,
    ``llmops.psl``), as a pure native column expression:

    - exact rules (``co.uk``, ``github.io``, 5-label ``*.jp`` city
      rules) match the longest suffix;
    - wildcard rules (``*.ck``) make any single extra label under the
      parent a public suffix;
    - exception rules (``!www.ck``) ARE the registrable domain for any
      host ending in them;
    - no rule matching falls to the PSL default ``*`` rule (the last
      label is the suffix).

    The rule sets become ``isin`` predicates, which Catalyst compiles
    to ``InSet`` hash-set probes — O(1) per row inside whole-stage
    codegen, no join, no Python; at 100 TB this runs at scan speed,
    with the rule sets riding the task binary (~4 MB serialized,
    broadcast once per stage) — the column-expression equivalent of a
    broadcast join against the PSL, without the join.

    Lowercases and strips any port first.  A host that IS a public
    suffix (or a single label, e.g. ``localhost``) returns itself —
    the graceful degradation a curation quota wants, rather than NULL.
    NULL host stays NULL.  Matching uses the Unicode rule form as
    published; Punycode hosts fall under the default rule."""
    from etl_batch_spark.llmops.psl import (
        MAX_SUFFIX_LABELS, load_rules, rules_in,
    )

    _, _, exc = load_rules()

    h = F.lower(F.regexp_replace(host, r":\d+$", ""))
    labels = F.split(h, r"\.")
    n = F.size(labels)

    def cand(k: int) -> Column:
        """Suffix of the last ``k`` labels; NULL when the host is
        shorter (``when`` evaluates lazily, so the out-of-range
        element_at never runs under ANSI mode)."""
        parts = [F.element_at(labels, -i) for i in range(k, 0, -1)]
        return F.when(n >= k, F.concat_ws(".", *parts))

    cands = {k: cand(k) for k in range(1, MAX_SUFFIX_LABELS + 2)}

    def nlabels(c: Column) -> Column:
        # label count of a candidate = dots + 1 (cheaper than re-split)
        return (
            F.length(c) - F.length(F.replace(c, F.lit("."), F.lit(""))) + 1
        ).cast("int")

    # Each rule set appears in the plan EXACTLY ONCE, as a lambda
    # predicate over the candidate array (NULL candidates — host
    # shorter than k — fail the IN and drop out of filter()).  The
    # public-suffix length is the longest match; the default '*' rule
    # guarantees at least 1, so 1-label exact rules need no testing.
    exact_max = F.array_max(
        F.transform(
            F.filter(
                F.array(*[cands[k] for k in range(2, MAX_SUFFIX_LABELS + 1)]),
                lambda c: rules_in(c, "exact"),
            ),
            nlabels,
        )
    )
    # a wildcard parent of j labels makes the (j+1)-label suffix
    # public — only when that extra label actually exists (j < n)
    wild_max = F.array_max(
        F.transform(
            F.filter(
                F.array(*[cands[k] for k in range(1, MAX_SUFFIX_LABELS)]),
                lambda c: rules_in(c, "wild") & (nlabels(c) < n),
            ),
            lambda c: nlabels(c) + 1,
        )
    )
    # greatest() skips NULLs (empty filter results)
    suffix_len = F.greatest(F.lit(1), exact_max, wild_max)

    # registrable domain = suffix + 1 label (suffix_len picks which
    # candidate; chained highest-first so exactly one branch fires)
    reg = None
    for k in range(MAX_SUFFIX_LABELS + 1, 1, -1):
        branch = F.when((suffix_len == k - 1) & (n >= k), cands[k])
        reg = branch if reg is None else branch.otherwise(reg)

    # exception rules trump everything: the rule itself is the
    # registrable domain for any host ending in it (8 rules — plain
    # isin literals are fine at this size)
    by_len: "dict[int, list[str]]" = {}
    for r in exc:
        by_len.setdefault(r.count(".") + 1, []).append(r)
    out = F.when(h.isNull() | (n <= 1), h)
    for k, rules in sorted(by_len.items()):
        out = out.when(cands[k].isin(*sorted(rules)), cands[k])
    return out.otherwise(F.when(n > suffix_len, reg).otherwise(h))


def psl_rules_df(spark) -> DataFrame:
    """The Public Suffix List as a tiny dimension table —
    ``(suffix, is_exact, is_wild_parent, is_exc)``, one row per
    distinct rule string (a string can be several kinds at once:
    ``ck`` is both an exact rule and a wildcard parent).  ≈9.5k rows,
    ~300 KB — the canonical broadcast-join side."""
    from etl_batch_spark.llmops.psl import load_rules

    exact, wild, exc = load_rules()
    rows = [
        (s, s in exact, s in wild, s in exc)
        for s in sorted(exact | wild | exc)
    ]
    return spark.createDataFrame(
        rows,
        "suffix string, is_exact boolean, is_wild_parent boolean, "
        "is_exc boolean",
    )


def with_registered_domain(
    df: DataFrame, host_col: str, out_col: str = "registered_domain"
) -> DataFrame:
    """Adds ``out_col`` = eTLD+1 of ``host_col`` under the full Public
    Suffix List, via BROADCAST HASH JOINS against :func:`psl_rules_df`
    — the hot-path form of :func:`registered_domain` (same semantics,
    same PSL algorithm, bit-identical output).

    Plan shape: one candidate suffix per rule depth (k = 1..5 labels),
    each probed against the broadcast PSL table with a left equi-join —
    five O(1) hash probes per row, a single ~300 KB broadcast reused
    across all five joins (ReusedExchange), zero shuffles of ``df``,
    zero Python.  Unlike the column-expression variant this keeps the
    task binary small (the rule set lives in the broadcast, not in a
    9.4k-literal InSet riding every task) and the query build cheap —
    what a 100 TB crawl-curation pipeline should call.

    Temporary ``__rd_*`` helper columns are used and dropped; input
    columns under that prefix are rejected up front (they would be
    silently consumed and dropped)."""
    from etl_batch_spark.llmops.psl import MAX_SUFFIX_LABELS, load_rules

    clash = [c for c in df.columns if c.startswith("__rd_")]
    if clash:
        raise ValueError(
            f"with_registered_domain reserves the '__rd_' column prefix; "
            f"rename input column(s) {clash}"
        )

    _, _, exc = load_rules()
    exc_lens = sorted({r.count(".") + 1 for r in exc})

    psl = psl_rules_df(df.sparkSession)

    h = F.lower(F.regexp_replace(F.col(host_col), r":\d+$", ""))
    cur = (
        df.withColumn("__rd_h", h)
        .withColumn("__rd_labels", F.split(F.col("__rd_h"), r"\."))
        .withColumn("__rd_n", F.size("__rd_labels"))
    )
    n = F.col("__rd_n")
    for k in range(1, MAX_SUFFIX_LABELS + 2):
        parts = [
            F.element_at("__rd_labels", -i) for i in range(k, 0, -1)
        ]
        cur = cur.withColumn(
            f"__rd_c{k}", F.when(n >= k, F.concat_ws(".", *parts))
        )
    for k in range(1, MAX_SUFFIX_LABELS + 1):
        p = psl.select(
            F.col("suffix").alias(f"__rd_s{k}"),
            F.col("is_exact").alias(f"__rd_e{k}"),
            F.col("is_wild_parent").alias(f"__rd_w{k}"),
            F.col("is_exc").alias(f"__rd_x{k}"),
        )
        cur = cur.join(
            F.broadcast(p),
            F.col(f"__rd_c{k}") == F.col(f"__rd_s{k}"),
            "left",
        )

    # public-suffix length: longest match wins; default '*' rule → 1.
    # A wildcard parent at k-1 labels makes the k-label suffix public
    # (when that label exists).  greatest() skips the NULLs of
    # non-matching branches.
    suffix_len = F.greatest(
        F.lit(1),
        *[
            F.when(F.col(f"__rd_e{k}"), k)
            for k in range(2, MAX_SUFFIX_LABELS + 1)
        ],
        *[
            F.when(F.col(f"__rd_w{k - 1}") & (n >= k), k)
            for k in range(2, MAX_SUFFIX_LABELS + 1)
        ],
    )
    reg = None
    for k in range(MAX_SUFFIX_LABELS + 1, 1, -1):
        branch = F.when(
            (suffix_len == k - 1) & (n >= k), F.col(f"__rd_c{k}")
        )
        reg = branch if reg is None else branch.otherwise(reg)

    out = F.when(F.col("__rd_h").isNull() | (n <= 1), F.col("__rd_h"))
    for k in exc_lens:
        out = out.when(
            F.coalesce(F.col(f"__rd_x{k}"), F.lit(False)),
            F.col(f"__rd_c{k}"),
        )
    out = out.otherwise(
        F.when(n > suffix_len, reg).otherwise(F.col("__rd_h"))
    )

    helper = [c for c in cur.columns if c.startswith("__rd_")]
    return cur.withColumn(out_col, out).drop(*helper)
