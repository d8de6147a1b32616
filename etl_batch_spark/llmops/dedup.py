"""Deduplication operators for 100 TB-scale text corpora.

Five strategies, all expressed with native Spark functions (JVM-side,
whole-stage codegen, zero Python UDFs):

- :func:`exact_groups`        — hash-groupBy on raw content
- :func:`fingerprint_groups`  — hash-groupBy on normalized content
- :func:`jaccard_pairs`       — n-gram shingles, candidates via
  join-on-shared-shingle (never a cross join)
- :func:`minhash_signatures` / :func:`minhash_candidate_pairs` — MinHash
  LSH: the signature (``num_hashes`` longs) replaces the shingle set;
  candidates come from an equi-join on (position, minhash)
- :func:`simhash`             — bit-vote signatures for Hamming near-dup

Scale notes: every pairwise operator funnels through an equi-join key
(shingle, band, signature position), so shuffles are linear in corpus
size.  For production corpora add a document-frequency cap on shingles
(drop shingles appearing in > df_cap docs) to bound hot-key fanout —
exposed as ``df_cap`` on :func:`jaccard_pairs`.

Hashes are md5-derived (not Spark's murmur ``hash()``) so results are
engine-portable and stable across Spark versions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 60-bit portable hash: first 15 hex chars of md5 (same construction is
# expressible in DuckDB/Trino/Flink SQL for cross-engine validation)
H60 = "cast(conv(substr(md5({expr}), 1, 15), 16, 10) as bigint)"

TOKENS_EXPR = "filter(split(lower({col}), '\\\\s+'), x -> x != '')"

SHINGLES_EXPR = (
    "case when size({toks}) >= {n} then "
    "transform(sequence(0, size({toks}) - {n}), i -> concat_ws(' ', {parts})) "
    "else array() end"
)


def tokens(col: str = "text") -> Column:
    """Lowercased whitespace tokens, empties dropped."""
    return F.expr(TOKENS_EXPR.format(col=col))


def shingle_array(toks_expr: str = "toks", n: int = 3) -> Column:
    parts = ", ".join(f"{toks_expr}[i+{j}]" for j in range(n))
    return F.expr(SHINGLES_EXPR.format(toks=toks_expr, n=n, parts=parts))


def shingles(df: DataFrame, *, id_col: str = "doc_id", text_col: str = "text", n: int = 3) -> DataFrame:
    """Distinct (id, shingle) pairs — the substrate for Jaccard/MinHash."""
    return (
        df.withColumn("toks", tokens(text_col))
        .select(id_col, F.explode(shingle_array("toks", n)).alias("shingle"))
        .distinct()
    )


# ---------------------------------------------------------------------------
# exact + fingerprint
# ---------------------------------------------------------------------------

def exact_groups(df: DataFrame, *, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Group identical content: (content_hash, keeper_doc_id, n_copies).
    Hash first — grouping 100 TB of raw text by the text itself would
    shuffle the full payload; md5 shuffles 32 bytes/row."""
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("content_hash"))
        .agg(F.min(id_col).alias("keeper_doc_id"), F.count(F.lit(1)).alias("n_copies"))
    )


def normalized_fingerprint(text_col: str = "text") -> Column:
    return F.md5(F.trim(F.regexp_replace(F.lower(F.col(text_col)), "\\s+", " ")))


def fingerprint_groups(df: DataFrame, *, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    return (
        df.groupBy(normalized_fingerprint(text_col).alias("fingerprint"))
        .agg(F.min(id_col).alias("keeper_doc_id"), F.count(F.lit(1)).alias("n_copies"))
    )


def drop_exact_duplicates(df: DataFrame, *, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Return the deduplicated corpus (keeper row per identical text)."""
    keepers = exact_groups(df, id_col=id_col, text_col=text_col).select(
        F.col("keeper_doc_id").alias(id_col)
    )
    return df.join(keepers, id_col, "left_semi")


# ---------------------------------------------------------------------------
# n-gram Jaccard
# ---------------------------------------------------------------------------

def _pairs_from_groups(df: DataFrame, group_cols: list[str], id_col: str) -> DataFrame:
    """(doc_a, doc_b) for every unordered id pair sharing a group key.

    One aggregation + an array-combinations explode instead of a
    self-join: the self-join shape shuffles the exploded table twice and
    recomputes its lineage for each side; this shape scans once and
    shuffles once before the pair explode.  Group fanout is quadratic in
    group size — callers bound it (df_cap / minhash bands) so arrays
    stay small; that bound is what makes the operator safe at 100 TB.
    """
    groups = (
        df.groupBy(*group_cols)
        .agg(F.array_sort(F.collect_set(id_col)).alias("ds"))
        .filter(F.size("ds") >= 2)
    )
    pairs = F.expr(
        "flatten(transform(ds, (x, i) -> "
        "transform(slice(ds, i + 2, size(ds) - i - 1), y -> struct(x AS doc_a, y AS doc_b))))"
    )
    return groups.select(F.explode(pairs).alias("p")).select("p.doc_a", "p.doc_b")


def jaccard_pairs(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.8,
    df_cap: int | None = None,
) -> DataFrame:
    """(doc_a, doc_b, jaccard) for pairs with shingle-set Jaccard ≥
    threshold.  ``df_cap`` drops shingles occurring in more than that
    many documents (hot-key guard for web-scale corpora)."""
    sh = shingles(df, id_col=id_col, text_col=text_col, n=n)
    if df_cap is not None:
        rare = (
            sh.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") <= df_cap)
            .select("shingle")
        )
        sh = sh.join(rare, "shingle", "left_semi")
    # the shingle table feeds both the size agg and the pair generation —
    # persist so tokenize+shingle+distinct runs once
    sh = sh.persist()
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    common = (
        _pairs_from_groups(sh, ["shingle"], id_col)
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col(id_col).alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("doc_b"), F.col("n_sh").alias("n_b"))
    jac = F.col("n_common").cast("double") / (F.col("n_a") + F.col("n_b") - F.col("n_common"))
    return (
        common.join(sa, "doc_a")
        .join(sb, "doc_b")
        .filter(jac >= threshold)
        .select("doc_a", "doc_b", F.round(jac, 4).alias("jaccard"))
    )


# ---------------------------------------------------------------------------
# MinHash LSH
# ---------------------------------------------------------------------------

def minhash_signatures(
    sh: DataFrame, *, id_col: str = "doc_id", num_hashes: int = 8
) -> DataFrame:
    """(id, i, minh): position-i minhash per document over its shingles.
    Seeded family: h_i(s) = md5-60bit of "i|s"."""
    spark = sh.sparkSession
    seeds = spark.range(num_hashes).select(F.col("id").cast("int").alias("i"))
    h = F.expr(H60.format(expr="concat(cast(i as string), '|', shingle)"))
    return (
        sh.crossJoin(F.broadcast(seeds))
        .groupBy(id_col, "i")
        .agg(F.min(h).alias("minh"))
    )


def minhash_candidate_pairs(
    sig: DataFrame, *, id_col: str = "doc_id", num_hashes: int = 8
) -> DataFrame:
    """(doc_a, doc_b, n_hash_agree, est_jaccard) for pairs agreeing on ≥1
    signature position (b=num_hashes, r=1 OR-amplification).  Pair
    generation groups by (position, minhash) — a band bucket is a set of
    near-identical docs, so bucket sizes are naturally small."""
    return (
        _pairs_from_groups(sig, ["i", "minh"], id_col)
        .groupBy("doc_a", "doc_b")
        .agg(
            F.count(F.lit(1)).alias("n_hash_agree"),
            F.round(F.count(F.lit(1)) / float(num_hashes), 4).alias("est_jaccard"),
        )
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash(
    df: DataFrame, *, id_col: str = "doc_id", text_col: str = "text", bits: int = 16
) -> DataFrame:
    """(id, simhash): bit-vote signature over distinct tokens; near-dups
    differ in few bits (compare with Hamming distance downstream)."""
    spark = df.sparkSession
    toks = (
        df.withColumn("toks", tokens(text_col))
        .select(id_col, F.explode("toks").alias("tok"))
        .distinct()
    )
    positions = spark.range(bits).select(F.col("id").cast("int").alias("j"))
    h = H60.format(expr="tok")
    vote = F.sum(F.when(F.expr(f"(({h}) >> j) & 1 = 1"), 1).otherwise(-1)).alias("vote")
    votes = toks.crossJoin(F.broadcast(positions)).groupBy(id_col, "j").agg(vote)
    return (
        votes.groupBy(id_col)
        .agg(
            F.sum(F.when(F.col("vote") >= 0, F.expr("shiftleft(1, j)")).otherwise(0))
            .cast("long")
            .alias(f"simhash{bits}")
        )
    )
