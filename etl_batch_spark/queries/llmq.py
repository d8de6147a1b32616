"""LLM-data-pipeline queries (north star, BASELINE.json), oracle-checked.

Thin instantiations of the first-class operators in
``etl_batch_spark.llmops`` over the fixture tables, each paired with a
DuckDB oracle.  See llmops/dedup.py, similarity.py, text.py for the
operator implementations and their 100 TB-scale design notes.

The oracles re-express the operators in DuckDB's dialect; hash functions
are md5-derived on both sides so results agree bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_batch_spark.catalog import load_table
from etl_batch_spark.llmops import dedup, multimodal, sampling, similarity, text
from etl_batch_spark.queries.registry import query

# DuckDB twins of the shared building blocks (Spark forms live in llmops)
_DUCK_H60 = "(('0x' || substr(md5({expr}), 1, 15))::BIGINT)"
# '[\\s\\x0B]+' = Java regex \\s: RE2's \\s lacks vertical tab, the JVM
# operators split on Java \\s — pin the oracle to the engine contract
_DUCK_TOKENS = "list_filter(string_split_regex(lower(text), '[\\s\\x0B]+'), x -> x <> '')"
_DUCK_SHINGLES = (
    "list_transform(generate_series(1, len(toks) - 2), "
    "i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])"
)
_DUCK_DOC_SHINGLES = f"""
    SELECT DISTINCT doc_id, shingle
    FROM (SELECT doc_id, UNNEST({_DUCK_SHINGLES}) AS shingle
          FROM (SELECT doc_id, {_DUCK_TOKENS} AS toks FROM documents))
"""


def _documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


# ---------------------------------------------------------------------------
# dedup
# ---------------------------------------------------------------------------
@query(
    "dd01_dedup_exact",
    bench=True,
    doc="exact dedup via content-hash groupBy (llmops.dedup.exact_groups)",
    oracle="""
    SELECT md5(text) AS content_hash,
           MIN(doc_id) AS keeper_doc_id,
           COUNT(*) AS n_copies
    FROM documents
    GROUP BY 1
    """,
)
def dd01_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.exact_groups(_documents(spark, sf_dir))


@query(
    "dd02_fingerprint",
    doc="normalized-fingerprint dedup (llmops.dedup.fingerprint_groups)",
    oracle="""
    SELECT md5(trim(regexp_replace(lower(text), '[\\s\\x0B]+', ' ', 'g'))) AS fingerprint,
           MIN(doc_id) AS keeper_doc_id,
           COUNT(*) AS n_copies
    FROM documents
    GROUP BY 1
    """,
)
def dd02_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.fingerprint_groups(_documents(spark, sf_dir))


@query(
    "dd03_ngram_jaccard",
    bench=True,
    doc="word-3-gram Jaccard near-dup pairs (llmops.dedup.jaccard_pairs)",
    oracle=f"""
    WITH sh AS ({_DUCK_DOC_SHINGLES}),
    sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY 1),
    common AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT c.doc_a, c.doc_b,
           ROUND(CAST(c.n_common AS DOUBLE)
                 / (sa.n_sh + sb.n_sh - c.n_common), 4) AS jaccard
    FROM common c
    JOIN sizes sa ON sa.doc_id = c.doc_a
    JOIN sizes sb ON sb.doc_id = c.doc_b
    WHERE CAST(c.n_common AS DOUBLE) / (sa.n_sh + sb.n_sh - c.n_common) >= 0.03
    """,
)
def dd03_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.jaccard_pairs(_documents(spark, sf_dir), threshold=0.03)


_DUCK_MINHASH_SIG = f"""
    SELECT doc_id, i,
           MIN({_DUCK_H60.format(expr="CAST(i AS VARCHAR) || '|' || shingle")}) AS minh
    FROM ({_DUCK_DOC_SHINGLES}) sh
    CROSS JOIN (SELECT UNNEST(generate_series(0, 7)) AS i)
    GROUP BY doc_id, i
"""


@query(
    "dd04_minhash_lsh",
    bench=True,
    doc="MinHash-LSH candidate pairs, b=8/r=1 (llmops.dedup.minhash_*)",
    oracle=f"""
    WITH sig AS ({_DUCK_MINHASH_SIG})
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           COUNT(*) AS n_hash_agree,
           ROUND(COUNT(*) / 8.0, 4) AS est_jaccard
    FROM sig a JOIN sig b
      ON a.i = b.i AND a.minh = b.minh AND a.doc_id < b.doc_id
    GROUP BY 1, 2
    """,
)
def dd04_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    ss = dedup.shingle_sets(_documents(spark, sf_dir))
    sig = dedup.minhash_signatures(ss, num_hashes=8)
    return dedup.minhash_candidate_pairs(sig, num_hashes=8)


# ---------------------------------------------------------------------------
# dd13 — dedup recall harness (the dedup twin of ss12): how much of the
# TRUE near-dup pair set (exact Jaccard ≥ 0.2, dd03's inverted-index
# computation) does the MinHash-LSH candidate generation (dd04, b=8
# r=1 banding) recover, and at what candidate cost?  One summary row:
# recall is the number users tune num_hashes/banding against before
# trusting the approximate pipeline at 100 TB, and both sides are
# md5-deterministic so the measurement itself oracle-checks.
# ---------------------------------------------------------------------------
@query(
    "dd13_lsh_dedup_recall",
    doc="MinHash-LSH candidate recall vs exact Jaccard≥0.2 truth "
    "(dedup.minhash_candidate_pairs ∩ dedup.jaccard_pairs)",
    oracle=f"""
    WITH sh AS ({_DUCK_DOC_SHINGLES}),
    sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY 1),
    common AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    truth AS (
      SELECT c.doc_a, c.doc_b
      FROM common c
      JOIN sizes sa ON sa.doc_id = c.doc_a
      JOIN sizes sb ON sb.doc_id = c.doc_b
      WHERE CAST(c.n_common AS DOUBLE) / (sa.n_sh + sb.n_sh - c.n_common) >= 0.2
    ),
    sig AS ({_DUCK_MINHASH_SIG}),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM sig a JOIN sig b
        ON a.i = b.i AND a.minh = b.minh AND a.doc_id < b.doc_id
    )
    SELECT (SELECT COUNT(*) FROM truth) AS n_true,
           (SELECT COUNT(*) FROM cand) AS n_candidates,
           (SELECT COUNT(*) FROM truth t
             JOIN cand c ON t.doc_a = c.doc_a AND t.doc_b = c.doc_b) AS n_hit,
           ROUND((SELECT COUNT(*) FROM truth t
                   JOIN cand c ON t.doc_a = c.doc_a AND t.doc_b = c.doc_b)
                 / NULLIF(CAST((SELECT COUNT(*) FROM truth) AS DOUBLE), 0), 4)
             AS recall,
           ROUND((SELECT COUNT(*) FROM truth t
                   JOIN cand c ON t.doc_a = c.doc_a AND t.doc_b = c.doc_b)
                 / NULLIF(CAST((SELECT COUNT(*) FROM cand) AS DOUBLE), 0), 4)
             AS precision
    """,
)
def dd13_lsh_dedup_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _documents(spark, sf_dir)
    truth = dedup.jaccard_pairs(docs, threshold=0.2).select("doc_a", "doc_b")
    sig = dedup.minhash_signatures(dedup.shingle_sets(docs), num_hashes=8)
    cand = (
        dedup.minhash_candidate_pairs(sig, num_hashes=8)
        .select("doc_a", "doc_b")
        .distinct()
    )
    hit = truth.join(cand, ["doc_a", "doc_b"]).agg(
        F.count(F.lit(1)).alias("n_hit")
    )
    return (
        truth.agg(F.count(F.lit(1)).alias("n_true"))
        .crossJoin(F.broadcast(cand.agg(F.count(F.lit(1)).alias("n_candidates"))))
        .crossJoin(F.broadcast(hit))
        .select(
            "n_true",
            "n_candidates",
            "n_hit",
            F.round(
                F.col("n_hit") / F.nullif(F.col("n_true").cast("double"), F.lit(0.0)),
                4,
            ).alias("recall"),
            F.round(
                F.col("n_hit")
                / F.nullif(F.col("n_candidates").cast("double"), F.lit(0.0)),
                4,
            ).alias("precision"),
        )
    )


@query(
    "dd05_simhash",
    doc="16-bit SimHash signatures (llmops.dedup.simhash)",
    oracle=f"""
    WITH tok AS (
      SELECT DISTINCT doc_id, tok
      FROM (SELECT doc_id, UNNEST({_DUCK_TOKENS}) AS tok FROM documents)
    ),
    votes AS (
      SELECT doc_id, j,
             SUM(CASE WHEN (({_DUCK_H60.format(expr="tok")}) >> j) & 1 = 1
                      THEN 1 ELSE -1 END) AS vote
      FROM tok CROSS JOIN (SELECT UNNEST(generate_series(0, 15)) AS j)
      GROUP BY doc_id, j
    )
    SELECT doc_id,
           CAST(SUM(CASE WHEN vote >= 0 THEN 1 << j ELSE 0 END) AS BIGINT) AS simhash16
    FROM votes GROUP BY doc_id
    """,
)
def dd05_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    # one signature per document: doc_id is the document key, so
    # duplicate ingests (exact re-reads of the same doc) collapse before
    # the per-row signature fold — matching the oracle's doc_id grain
    docs = _documents(spark, sf_dir).select("doc_id", "text").distinct()
    return dedup.simhash(docs, bits=16)


_DUCK_BUCKET = (
    "(CASE WHEN e[1] > 0 THEN 1 ELSE 0 END + CASE WHEN e[2] > 0 THEN 2 ELSE 0 END"
    " + CASE WHEN e[3] > 0 THEN 4 ELSE 0 END + CASE WHEN e[4] > 0 THEN 8 ELSE 0 END"
    " + CASE WHEN e[5] > 0 THEN 16 ELSE 0 END + CASE WHEN e[6] > 0 THEN 32 ELSE 0 END)"
)


@query(
    "dd06_embedding_neardup",
    doc="embedding-cosine near-dup pairs via sign-bit buckets (llmops.similarity.neardup_pairs)",
    oracle=f"""
    WITH v AS (
      SELECT vec_id, e, {_DUCK_BUCKET} AS bucket,
             sqrt(list_sum(list_transform(e, x -> x * x))) AS nrm
      FROM (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings)
    )
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           ROUND(list_dot_product(a.e, b.e) / (a.nrm * b.nrm), 6) AS cosine
    FROM v a JOIN v b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
    WHERE ROUND(list_dot_product(a.e, b.e) / (a.nrm * b.nrm), 6) >= 0.35
    """,
)
def dd06_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.neardup_pairs(emb, threshold=0.35, n_bits=6)


@query(
    "dd07_neardup_clusters",
    bench=True,
    doc="near-dup clusters: MinHash pairs (≥4/8 bands) → connected components "
    "(llmops.dedup.connected_components, large-star/small-star)",
    oracle=f"""
    WITH RECURSIVE sig AS ({_DUCK_MINHASH_SIG}),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM sig a JOIN sig b
        ON a.i = b.i AND a.minh = b.minh AND a.doc_id < b.doc_id
      GROUP BY 1, 2
      HAVING COUNT(*) >= 4
    ),
    sym AS (
      SELECT doc_a AS u, doc_b AS v FROM pairs
      UNION
      SELECT doc_b, doc_a FROM pairs
    ),
    reach(u, v) AS (
      SELECT u, v FROM sym
      UNION
      SELECT r.u, s.v FROM reach r JOIN sym s ON r.v = s.u WHERE s.v <> r.u
    )
    SELECT u AS doc_id, LEAST(u, MIN(v)) AS component
    FROM reach GROUP BY u
    """,
)
def dd07_neardup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate pairs agreeing on ≥4 of 8 minhash positions (est Jaccard
    ≥ 0.5) become edges; components give one cluster id per document.
    The oracle computes the same clusters via transitive closure
    (recursive CTE) — tractable at sf0.01, while the Spark side's
    large-star/small-star is the O(log n)-round 100 TB path."""
    sig = dedup.minhash_signatures(
        dedup.shingle_sets(_documents(spark, sf_dir)), num_hashes=8
    )
    edges = (
        dedup.minhash_candidate_pairs(sig, num_hashes=8)
        .filter(F.col("n_hash_agree") >= 4)
        .select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    )
    return dedup.connected_components(edges).select(
        F.col("node").alias("doc_id"), "component"
    )


# ---------------------------------------------------------------------------
# similarity search
# ---------------------------------------------------------------------------
@query(
    "ss01_cosine_topk",
    bench=True,
    doc="brute-force cosine top-5 for 10 query vectors (llmops.similarity.cosine_topk)",
    oracle="""
    WITH v AS (
      SELECT vec_id, embedding::DOUBLE[] AS e,
             sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x))) AS nrm
      FROM embeddings
    ),
    pairs AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             ROUND(list_dot_product(q.e, c.e) / (q.nrm * c.nrm), 6) AS cosine
      FROM v q JOIN v c ON c.vec_id <> q.vec_id
      WHERE q.vec_id < 10
    )
    SELECT query_id, neighbor_id, cosine
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                       ORDER BY cosine DESC, neighbor_id) AS rn
          FROM pairs)
    WHERE rn <= 5
    """,
)
def ss01_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.cosine_topk(emb, emb.filter(F.col("vec_id") < 10), k=5)


@query(
    "ss02_lsh_bucketed_ann",
    doc="sign-bit LSH-bucketed ANN top-3 (llmops.similarity.bucketed_topk)",
    oracle=f"""
    WITH v AS (
      SELECT vec_id, e, {_DUCK_BUCKET} AS bucket,
             sqrt(list_sum(list_transform(e, x -> x * x))) AS nrm
      FROM (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings)
    ),
    pairs AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             ROUND(list_dot_product(q.e, c.e) / (q.nrm * c.nrm), 6) AS cosine
      FROM v q JOIN v c ON q.bucket = c.bucket AND c.vec_id <> q.vec_id
      WHERE q.vec_id < 20
    )
    SELECT query_id, neighbor_id, cosine
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                       ORDER BY cosine DESC, neighbor_id) AS rn
          FROM pairs)
    WHERE rn <= 3
    """,
)
def ss02_lsh_bucketed_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.bucketed_topk(emb, emb.filter(F.col("vec_id") < 20), k=3, n_bits=6)


_DUCK_IVF_ASSIGN = """
    v AS (
      SELECT vec_id, embedding::DOUBLE[] AS e,
             sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x))) AS nrm
      FROM embeddings
    ),
    cents AS (
      -- first 16 BY id, matching ivf_topk's orderBy+limit seeding —
      -- "vec_id < 16" only coincides with it when ids are dense from 0
      SELECT vec_id AS cent_id, e AS ce, nrm AS cn FROM v
      ORDER BY vec_id LIMIT 16
    ),
    assign AS (
      SELECT vec_id, e, nrm, cent_id FROM (
        SELECT v.vec_id, v.e, v.nrm, c.cent_id,
               ROW_NUMBER() OVER (
                 PARTITION BY v.vec_id
                 ORDER BY ROUND(list_dot_product(v.e, c.ce) / (v.nrm * c.cn), 6) DESC,
                          c.cent_id
               ) AS rn
        FROM v CROSS JOIN cents c
      ) WHERE rn = 1
    ),
    qprobe AS (
      SELECT vec_id AS query_id, e AS qe, nrm AS qn, cent_id FROM (
        SELECT v.vec_id, v.e, v.nrm, c.cent_id,
               ROW_NUMBER() OVER (
                 PARTITION BY v.vec_id
                 ORDER BY ROUND(list_dot_product(v.e, c.ce) / (v.nrm * c.cn), 6) DESC,
                          c.cent_id
               ) AS rn
        FROM v CROSS JOIN cents c WHERE v.vec_id < 20
      ) WHERE rn <= 2
    )
"""


@query(
    "ss03_ivf_ann",
    doc="IVF-Flat ANN top-3, 16 seed centroids, nprobe=2 (llmops.similarity.ivf_topk)",
    oracle=f"""
    WITH {_DUCK_IVF_ASSIGN},
    pairs AS (
      SELECT q.query_id, a.vec_id AS neighbor_id,
             ROUND(list_dot_product(q.qe, a.e) / (q.qn * a.nrm), 6) AS cosine
      FROM qprobe q JOIN assign a
        ON a.cent_id = q.cent_id AND a.vec_id <> q.query_id
    )
    SELECT query_id, neighbor_id, cosine
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                       ORDER BY cosine DESC, neighbor_id) AS rn
          FROM pairs)
    WHERE rn <= 3
    """,
)
def ss03_ivf_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.ivf_topk(
        emb, emb.filter(F.col("vec_id") < 20), k=3, n_centroids=16, nprobe=2
    )


def _dd12_bench_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bench form at the documented production dial: n_clusters ~ sqrt(n)
    (SCALE.md / SemDeDup paper), so within-cluster pair work stays ~n
    instead of n^2/k with a fixed k.  The correctness form pins k=16 for
    the DuckDB oracle; this is the configuration a user runs at scale —
    same operator, same plan shape, scale-sized knob.  n comes from the
    parquet footer (no Spark action), so every timed run measures only
    the operator."""
    import math

    import pyarrow.parquet as pq

    from etl_batch_spark.catalog import table_path

    n = pq.ParquetFile(table_path(sf_dir, "embeddings")).metadata.num_rows
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.semantic_dedup(
        emb, n_clusters=max(16, math.isqrt(n)), threshold=0.35
    )


@query(
    "dd12_semantic_dedup",
    doc="SemDeDup: cluster embeddings, drop items with an earlier same-cluster "
    "neighbor at cosine >= 0.35 (llmops.similarity.semantic_dedup)",
    bench=True,
    bench_build=_dd12_bench_build,
    oracle=f"""
    WITH {_DUCK_IVF_ASSIGN},
    dropped AS (
      SELECT DISTINCT b.vec_id
      FROM assign a JOIN assign b
        ON a.cent_id = b.cent_id AND a.vec_id < b.vec_id
      WHERE ROUND(list_dot_product(a.e, b.e) / (a.nrm * b.nrm), 6) >= 0.35
    )
    SELECT s.vec_id, s.cent_id AS cluster, (d.vec_id IS NULL) AS kept
    FROM assign s LEFT JOIN dropped d ON s.vec_id = d.vec_id
    """,
)
def dd12_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.semantic_dedup(emb, n_clusters=16, threshold=0.35)


# squared L2 distance between two 8-dim slices, in integer micro-units —
# integer partials keep every SUM/argmin order-independent, so Spark and
# DuckDB agree bit-for-bit (float partial sums would drift with agg order)
_DUCK_SQD_MICRO = (
    "CAST(round(list_sum(list_transform(generate_series(1, 8), "
    "i -> ({a}[i] - {b}[i]) * ({a}[i] - {b}[i]))) * 1e6, 0) AS BIGINT)"
)

_DUCK_PQ = f"""
    v AS (
      SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
    ),
    subs AS (SELECT UNNEST(generate_series(0, 7)) AS sub),
    cb AS (
      -- first 16 BY id, matching _pq_prep's orderBy+limit codebook —
      -- "vec_id < 16" only coincides with it when ids are dense from 0
      SELECT s.sub, c.vec_id AS code, c.e[s.sub * 8 + 1 : s.sub * 8 + 8] AS cvec
      FROM (SELECT vec_id, e FROM v ORDER BY vec_id LIMIT 16) c, subs s
    ),
    sv AS (
      SELECT v.vec_id, s.sub, v.e[s.sub * 8 + 1 : s.sub * 8 + 8] AS svec
      FROM v, subs s
    ),
    enc AS (
      SELECT vec_id, sub, code FROM (
        SELECT sv.vec_id, sv.sub, cb.code,
               ROW_NUMBER() OVER (
                 PARTITION BY sv.vec_id, sv.sub
                 ORDER BY {_DUCK_SQD_MICRO.format(a="sv.svec", b="cb.cvec")}, cb.code
               ) AS rn
        FROM sv JOIN cb ON sv.sub = cb.sub
      ) WHERE rn = 1
    ),
    lut AS (
      SELECT sv.vec_id AS query_id, sv.sub, cb.code,
             {_DUCK_SQD_MICRO.format(a="sv.svec", b="cb.cvec")} AS pd
      FROM sv JOIN cb ON sv.sub = cb.sub
      WHERE sv.vec_id < 20
    )
"""


@query(
    "ss10_pq_ann",
    doc="product-quantization ANN: m=8 subspaces, ks=16 codes, asymmetric-"
    "distance top-3 over PQ codes only (llmops.similarity.pq_topk)",
    bench=True,
    oracle=f"""
    WITH {_DUCK_PQ},
    dist AS (
      SELECT l.query_id, e.vec_id AS neighbor_id, CAST(SUM(l.pd) AS BIGINT) AS adist_micro
      FROM enc e JOIN lut l ON e.sub = l.sub AND e.code = l.code
      WHERE e.vec_id <> l.query_id
      GROUP BY l.query_id, e.vec_id
    )
    SELECT query_id, neighbor_id, adist_micro
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                       ORDER BY adist_micro, neighbor_id) AS rn
          FROM dist)
    WHERE rn <= 3
    """,
)
def ss10_pq_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.pq_topk(
        emb, emb.filter(F.col("vec_id") < 20), k=3, m=8, ks=16
    )


@query(
    "ss11_random_projection",
    doc="Johnson-Lindenstrauss 64->16 Rademacher projection, exact integer "
    "micro-units, row-local no-shuffle (llmops.similarity.random_project)",
    oracle="""
    WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
    x AS (
      -- rid keeps the oracle PER-ROW (map semantics): the projection is
      -- a row-local transform, so duplicate-ingested rows each project
      -- (grouping by vec_id alone would SUM duplicates into doubled
      -- projections); rid is only a grouping key, dropped from output
      SELECT vec_id, ROW_NUMBER() OVER () AS rid,
             list_transform(e, w -> CAST(round(w * 1e6, 0) AS BIGINT)) AS x
      FROM v
    ),
    grid AS (
      SELECT i.i, j.j,
             CASE WHEN (('0x' || substr(md5('rp|' || CAST(i.i AS VARCHAR)
                         || '|' || CAST(j.j AS VARCHAR)), 1, 15))::BIGINT % 2) = 0
                  THEN 1 ELSE -1 END AS s
      FROM (SELECT UNNEST(generate_series(0, 63)) AS i) i
      CROSS JOIN (SELECT UNNEST(generate_series(0, 15)) AS j) j
    )
    SELECT x.vec_id, CAST(g.j AS INT) AS j,
           CAST(SUM(g.s * x.x[g.i + 1]) AS BIGINT) AS proj_micro
    FROM x CROSS JOIN grid g
    GROUP BY x.rid, x.vec_id, g.j
    """,
)
def ss11_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    # per-ROW map semantics (see oracle's rid note): no distinct — the
    # operator's contract is a shuffle-free row-local transform, pinned
    # by test_ss11_random_projection_is_shuffle_free
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.random_project(emb, out_dim=16, in_dim=64)


# ---------------------------------------------------------------------------
# ss12 — ANN recall harness: recall@3 of the single-table LSH index
# (ss02's plan) AND the 3-table OR-construction
# (similarity.multitable_topk) against the exact brute-force top-3
# (ss01's plan), per query.  The eval every production ANN deployment
# needs before trusting the approximate path — and the dial it turns: L
# tables lift recall ~1-(1-p)^L at L× the (still linear) candidate
# cost.  All three sides are deterministic (ties broken by
# neighbor_id), so even the QUALITY measurement is oracle-checkable.
# Scale: exact side is bounded by the query sample (broadcast); both
# LSH sides are linear bucketed joins — recall evaluation on a sample
# costs scans, never an all-pairs.
# ---------------------------------------------------------------------------
def _duck_offset_bucket(offset: int) -> str:
    return "(" + " + ".join(
        f"CASE WHEN e[{offset + i + 1}] > 0 THEN {1 << i} ELSE 0 END"
        for i in range(6)
    ) + ")"


@query(
    "ss13_multitable_ann",
    bench=True,
    doc="3-table OR-construction LSH ANN top-3 "
    "(similarity.multitable_topk: recall ~1-(1-p)^L at linear cost)",
    oracle=f"""
    WITH v AS (
      SELECT vec_id, e, {_duck_offset_bucket(0)} AS b0,
             {_duck_offset_bucket(6)} AS b1, {_duck_offset_bucket(12)} AS b2,
             sqrt(list_sum(list_transform(e, x -> x * x))) AS nrm
      FROM (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings)
    ),
    pairs AS (
      SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             ROUND(list_dot_product(q.e, c.e) / (q.nrm * c.nrm), 6) AS cosine
      FROM v q JOIN v c
        ON (q.b0 = c.b0 OR q.b1 = c.b1 OR q.b2 = c.b2)
       AND c.vec_id <> q.vec_id
      WHERE q.vec_id < 20
    )
    SELECT query_id, neighbor_id, cosine
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                       ORDER BY cosine DESC, neighbor_id) AS rn
          FROM pairs)
    WHERE rn <= 3
    """,
)
def ss13_multitable_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.multitable_topk(
        emb, emb.filter(F.col("vec_id") < 20), k=3, n_bits=6, n_tables=3
    )


# ---------------------------------------------------------------------------
# ss14 — hard-negative mining for contrastive training: per anchor, the
# top-3 most-similar corpus vectors with a DIFFERENT label — the pairs
# a contrastive loss learns most from.  Same broadcast-anchor scan
# shape as ss01 (the label filter rides the join), so cost is
# O(|corpus|·|anchors|) folds with anchors a bounded sample; at 100 TB
# swap the scan for the ss02/ss13 bucketed candidates and keep the
# label filter + window unchanged.
# ---------------------------------------------------------------------------
@query(
    "ss14_hard_negatives",
    doc="contrastive hard negatives: top-3 different-label neighbors "
    "per anchor (broadcast-anchor scan, label filter in the join)",
    oracle="""
    WITH v AS (
      SELECT vec_id, label, embedding::DOUBLE[] AS e,
             sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x))) AS nrm
      FROM embeddings
    ),
    pairs AS (
      SELECT q.vec_id AS anchor_id, q.label AS anchor_label,
             c.vec_id AS negative_id, c.label AS negative_label,
             ROUND(list_dot_product(q.e, c.e) / (q.nrm * c.nrm), 6) AS cosine
      FROM v q JOIN v c ON c.vec_id <> q.vec_id AND c.label <> q.label
      WHERE q.vec_id < 20
    )
    SELECT anchor_id, anchor_label, negative_id, negative_label, cosine
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY anchor_id
                                       ORDER BY cosine DESC, negative_id) AS rn
          FROM pairs)
    WHERE rn <= 3
    """,
)
def ss14_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from etl_batch_spark.catalog import fan_out
    from etl_batch_spark.llmops.similarity import DOT, as_double, l2_norm

    emb = load_table(spark, sf_dir, "embeddings")
    v = (
        fan_out(emb)
        .select("vec_id", "label", as_double("embedding").alias("e"))
        .withColumn("nrm", l2_norm("e"))
    )
    c = v.select(
        F.col("vec_id").alias("negative_id"),
        F.col("label").alias("negative_label"),
        F.col("e").alias("ce"),
        F.col("nrm").alias("cn"),
    )
    q = v.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("anchor_id"),
        F.col("label").alias("anchor_label"),
        F.col("e").alias("qe"),
        F.col("nrm").alias("qn"),
    )
    dot = F.expr(DOT.format(a="qe", b="ce"))
    pairs = (
        c.join(
            F.broadcast(q),
            (F.col("negative_id") != F.col("anchor_id"))
            & (F.col("negative_label") != F.col("anchor_label")),
        )
        .select(
            "anchor_id",
            "anchor_label",
            "negative_id",
            "negative_label",
            F.round(dot / (F.col("qn") * F.col("cn")), 6).alias("cosine"),
        )
    )
    w = W.partitionBy("anchor_id").orderBy(F.desc("cosine"), F.asc("negative_id"))
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(
            "anchor_id", "anchor_label", "negative_id", "negative_label", "cosine"
        )
    )


@query(
    "ss12_ann_recall",
    doc="recall@3 of 1-table vs 3-table LSH ANN against exact cosine "
    "top-3 (similarity.multitable_topk recall harness)",
    oracle=f"""
    WITH v AS (
      SELECT vec_id, e, {_duck_offset_bucket(0)} AS b0,
             {_duck_offset_bucket(6)} AS b1, {_duck_offset_bucket(12)} AS b2,
             sqrt(list_sum(list_transform(e, x -> x * x))) AS nrm
      FROM (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings)
    ),
    epairs AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             ROUND(list_dot_product(q.e, c.e) / (q.nrm * c.nrm), 6) AS cosine
      FROM v q JOIN v c ON c.vec_id <> q.vec_id
      WHERE q.vec_id < 20
    ),
    exact AS (
      SELECT query_id, neighbor_id
      FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                         ORDER BY cosine DESC, neighbor_id) AS rn
            FROM epairs)
      WHERE rn <= 3
    ),
    a1pairs AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             ROUND(list_dot_product(q.e, c.e) / (q.nrm * c.nrm), 6) AS cosine
      FROM v q JOIN v c ON q.b0 = c.b0 AND c.vec_id <> q.vec_id
      WHERE q.vec_id < 20
    ),
    approx1 AS (
      SELECT query_id, neighbor_id
      FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                         ORDER BY cosine DESC, neighbor_id) AS rn
            FROM a1pairs)
      WHERE rn <= 3
    ),
    a3pairs AS (
      SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             ROUND(list_dot_product(q.e, c.e) / (q.nrm * c.nrm), 6) AS cosine
      FROM v q JOIN v c
        ON (q.b0 = c.b0 OR q.b1 = c.b1 OR q.b2 = c.b2)
       AND c.vec_id <> q.vec_id
      WHERE q.vec_id < 20
    ),
    approx3 AS (
      SELECT query_id, neighbor_id
      FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                         ORDER BY cosine DESC, neighbor_id) AS rn
            FROM a3pairs)
      WHERE rn <= 3
    )
    SELECT e.query_id,
           CAST(COUNT(*) AS BIGINT) AS n_exact,
           CAST(COUNT(a1.neighbor_id) AS BIGINT) AS matched_1t,
           CAST(COUNT(a3.neighbor_id) AS BIGINT) AS matched_3t,
           ROUND(COUNT(a1.neighbor_id) / 3.0, 4) AS recall_1t,
           ROUND(COUNT(a3.neighbor_id) / 3.0, 4) AS recall_3t
    FROM exact e
    LEFT JOIN approx1 a1
      ON e.query_id = a1.query_id AND e.neighbor_id = a1.neighbor_id
    LEFT JOIN approx3 a3
      ON e.query_id = a3.query_id AND e.neighbor_id = a3.neighbor_id
    GROUP BY e.query_id
    """,
)
def ss12_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 20)
    exact = similarity.cosine_topk(emb, q, k=3).select("query_id", "neighbor_id")
    one = similarity.bucketed_topk(emb, q, k=3, n_bits=6).select(
        F.col("query_id").alias("q1"), F.col("neighbor_id").alias("n1")
    )
    three = similarity.multitable_topk(emb, q, k=3, n_bits=6, n_tables=3).select(
        F.col("query_id").alias("q3"), F.col("neighbor_id").alias("n3")
    )
    return (
        exact.join(
            one,
            (F.col("query_id") == F.col("q1")) & (F.col("neighbor_id") == F.col("n1")),
            "left",
        )
        .join(
            three,
            (F.col("query_id") == F.col("q3")) & (F.col("neighbor_id") == F.col("n3")),
            "left",
        )
        .groupBy("query_id")
        .agg(
            F.count(F.lit(1)).alias("n_exact"),
            F.count("n1").alias("matched_1t"),
            F.count("n3").alias("matched_3t"),
            F.round(F.count("n1") / F.lit(3.0), 4).alias("recall_1t"),
            F.round(F.count("n3") / F.lit(3.0), 4).alias("recall_3t"),
        )
    )


# ---------------------------------------------------------------------------
# multimodal columns (llmops.multimodal): binary payload + mapInPandas
# decode plumbing; the codec is a deterministic md5-derived stub, so the
# full Arrow-batched pipeline is oracle-checkable value-for-value.
# ---------------------------------------------------------------------------
@query(
    "mm01_decode_resize",
    doc="binary payload → mapInPandas fake-decode → resize plan (llmops.multimodal)",
    oracle="""
    SELECT doc_id, width, height,
           CAST(width * height AS BIGINT) AS n_pixels,
           CAST(least(224, ceil(width * round(least(1.0, 224.0 / greatest(width, height)), 6))) AS INT)
             AS target_width,
           CAST(least(224, ceil(height * round(least(1.0, 224.0 / greatest(width, height)), 6))) AS INT)
             AS target_height
    FROM (
      SELECT doc_id,
             CAST(64 + (('0x' || substr(md5(text), 1, 2))::BIGINT % 192) AS INT) AS width,
             CAST(64 + (('0x' || substr(md5(text), 3, 2))::BIGINT % 192) AS INT) AS height
      -- attach_payload drops NULL-text rows (no payload to fabricate)
      FROM documents WHERE text IS NOT NULL
    )
    """,
)
def mm01_decode_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = multimodal.attach_payload(_documents(spark, sf_dir))
    decoded = multimodal.decode_image(docs, fake=True)
    return multimodal.resize_plan(decoded).select(
        "doc_id", "width", "height", "n_pixels", "target_width", "target_height"
    )


@query(
    "mm02_frame_sample",
    doc="video frame-sample plan: duration → per-frame timestamps via sequence+explode (llmops.multimodal.frame_sample_plan)",
    oracle="""
    SELECT doc_id,
           CAST(frame_idx AS INT) AS frame_idx,
           ROUND(frame_idx / 2.0, 3) AS frame_ts
    FROM (
      SELECT doc_id, UNNEST(generate_series(0, n_frames - 1)) AS frame_idx
      FROM (
        SELECT doc_id,
               greatest(1, CAST(floor(length(text) / 500.0 * 2.0) AS BIGINT)) AS n_frames
        FROM documents
      )
    )
    """,
)
def mm02_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _documents(spark, sf_dir).select(
        "doc_id", (F.length("text") / 500.0).alias("duration_s")
    )
    return multimodal.frame_sample_plan(docs, fps=2.0)


# ---------------------------------------------------------------------------
# reproducible sampling (llmops.sampling): membership is a pure function
# of (salt, key) — partition-independent, engine-replayable
# ---------------------------------------------------------------------------
_DUCK_BUCKET_OF = (
    "(('0x' || substr(md5('{salt}' || '|' || CAST({key} AS VARCHAR)), 1, 15))::BIGINT"
    " % 1000000)"
)


@query(
    "sm01_hash_sample",
    doc="deterministic 10% corpus sample by doc_id hash (llmops.sampling.hash_sample)",
    oracle=f"""
    SELECT doc_id, source
    FROM documents
    WHERE {_DUCK_BUCKET_OF.format(salt="s0", key="doc_id")} < 100000
    """,
)
def sm01_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _documents(spark, sf_dir).select("doc_id", "source")
    return sampling.hash_sample(docs, key_col="doc_id", fraction=0.10)


@query(
    "sm02_stratified_sample",
    bench=True,
    doc="training-mix stratified sample: src0 100%, src1 50%, src2 10%, rest 0% "
    "(llmops.sampling.stratified_hash_sample)",
    oracle=f"""
    SELECT source, COUNT(*) AS n_docs
    FROM documents
    WHERE {_DUCK_BUCKET_OF.format(salt="s0", key="doc_id")} <
          CASE source WHEN 'src0' THEN 1000000
                      WHEN 'src1' THEN 500000
                      WHEN 'src2' THEN 100000
                      ELSE 0 END
    GROUP BY source
    """,
)
def sm02_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _documents(spark, sf_dir)
    kept = sampling.stratified_hash_sample(
        docs,
        key_col="doc_id",
        strata_col="source",
        fractions={"src0": 1.0, "src1": 0.5, "src2": 0.1},
    )
    return kept.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))


# ---------------------------------------------------------------------------
# text analysis
# ---------------------------------------------------------------------------
@query(
    "tx01_text_stats",
    bench=True,
    doc="per-document token stats (llmops.text.text_stats)",
    oracle=f"""
    SELECT doc_id,
           CAST(len(toks) AS BIGINT) AS n_tokens,
           CAST(len(list_distinct(toks)) AS BIGINT) AS n_uniq,
           ROUND(len(list_distinct(toks)) / CAST(NULLIF(len(toks), 0) AS DOUBLE), 4) AS ttr,
           ROUND(list_sum(list_transform(toks, x -> length(x)))
                 / CAST(NULLIF(len(toks), 0) AS DOUBLE), 4) AS avg_token_len
    FROM (SELECT doc_id, {_DUCK_TOKENS} AS toks FROM documents)
    """,
)
def tx01_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.text_stats(_documents(spark, sf_dir))


_EN = ", ".join(f"'{w}'" for w in text.STOPWORDS["en"])
_FR = ", ".join(f"'{w}'" for w in text.STOPWORDS["fr"])
_DE = ", ".join(f"'{w}'" for w in text.STOPWORDS["de"])


@query(
    "tx02_langid",
    doc="stopword-vote language-ID heuristic (llmops.text.lang_scores)",
    oracle=f"""
    SELECT lang,
           CASE WHEN en_n >= fr_n AND en_n >= de_n AND en_n > 0 THEN 'en'
                WHEN fr_n >= de_n AND fr_n > 0 THEN 'fr'
                WHEN de_n > 0 THEN 'de'
                ELSE 'unknown' END AS lang_pred,
           COUNT(*) AS n_docs
    FROM (
      SELECT lang,
             len(list_filter(toks, x -> x IN ({_EN}))) AS en_n,
             len(list_filter(toks, x -> x IN ({_FR}))) AS fr_n,
             len(list_filter(toks, x -> x IN ({_DE}))) AS de_n
      FROM (SELECT lang, {_DUCK_TOKENS} AS toks FROM documents)
    )
    GROUP BY 1, 2
    """,
)
def tx02_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    scored = text.lang_scores(_documents(spark, sf_dir))
    return (
        scored.groupBy("lang", text.lang_pred_col().alias("lang_pred"))
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


_TOK_RE_DUCK = "[a-z]+|[0-9]+|[^a-z0-9\\s\\x0B]"


@query(
    "tx03_token_count",
    doc="whitespace vs BPE-ish token counts per source (llmops.text.token_counts)",
    oracle=f"""
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(len(regexp_extract_all(lower(text), '{_TOK_RE_DUCK}'))) AS BIGINT) AS bpe_tokens,
           CAST(SUM(len(list_filter(string_split_regex(lower(text), '[\\s\\x0B]+'),
                                    x -> x <> ''))) AS BIGINT) AS ws_tokens
    FROM documents
    GROUP BY source
    """,
)
def tx03_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    counted = text.token_counts(_documents(spark, sf_dir))
    return (
        counted.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("bpe_tokens").alias("bpe_tokens"),
            F.sum("ws_tokens").alias("ws_tokens"),
        )
    )


@query(
    "tx05_winnow_fingerprints",
    doc="winnowing document fingerprints, k=3 w=4 (llmops.text.winnow_fingerprints)",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, {_DUCK_TOKENS} AS toks FROM documents
    ),
    h AS (
      SELECT doc_id,
             list_transform(generate_series(1, len(toks) - 2),
                            i -> {_DUCK_H60.format(expr="toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]")}) AS hs
      FROM t WHERE len(toks) >= 3
    )
    SELECT doc_id, UNNEST(fps) AS fingerprint
    FROM (
      SELECT doc_id,
             CASE WHEN len(hs) >= 4
                  THEN list_distinct(list_transform(generate_series(1, len(hs) - 3),
                                                    i -> list_min(hs[i:i+3])))
                  ELSE [list_min(hs)] END AS fps
      FROM h
    )
    """,
)
def tx05_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.winnow_fingerprints(_documents(spark, sf_dir), k=3, w=4)


@query(
    "tx06_redact_pii",
    doc="email/URL/long-digit redaction scrub (llmops.text.redact); "
    "fixture docs are clean, so 1-in-7 docs get deterministic synthetic "
    "PII appended on both sides before the scrub",
    oracle="""
    SELECT doc_id,
           regexp_replace(regexp_replace(regexp_replace(aug,
             '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}', '<EMAIL>', 'g'),
             'https?://[^\\s\\x0B]+', '<URL>', 'g'),
             '[0-9]{6,}', '<NUM>', 'g') AS clean_text,
           CAST(len(string_split(regexp_replace(regexp_replace(regexp_replace(aug,
             '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}', '<EMAIL>', 'g'),
             'https?://[^\\s\\x0B]+', '<URL>', 'g'),
             '[0-9]{6,}', '<NUM>', 'g'), '<EMAIL>')) - 1
           + len(string_split(regexp_replace(regexp_replace(regexp_replace(aug,
             '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}', '<EMAIL>', 'g'),
             'https?://[^\\s\\x0B]+', '<URL>', 'g'),
             '[0-9]{6,}', '<NUM>', 'g'), '<URL>')) - 1
           + len(string_split(regexp_replace(regexp_replace(regexp_replace(aug,
             '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}', '<EMAIL>', 'g'),
             'https?://[^\\s\\x0B]+', '<URL>', 'g'),
             '[0-9]{6,}', '<NUM>', 'g'), '<NUM>')) - 1 AS BIGINT) AS n_redactions
    FROM (
      SELECT doc_id,
             text || CASE WHEN doc_id % 7 = 0
               THEN ' contact user' || doc_id || '@example.com or ' ||
                    'https://site.example/p?id=' || doc_id || ' ref 1234567'
               ELSE '' END AS aug
      FROM documents
    )
    """,
)
def tx06_redact_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _documents(spark, sf_dir)
    aug = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 7 == 0,
                F.concat(
                    F.lit(" contact user"),
                    F.col("doc_id").cast("string"),
                    F.lit("@example.com or https://site.example/p?id="),
                    F.col("doc_id").cast("string"),
                    F.lit(" ref 1234567"),
                ),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    return text.redact(aug)


@query(
    "tx04_quality_score",
    doc="composite quality score (llmops.text.quality_score)",
    oracle=f"""
    SELECT doc_id,
           ROUND(0.4 * LEAST(1.0, len(toks) / 100.0)
                 + 0.3 * (len(list_distinct(toks)) / CAST(NULLIF(len(toks), 0) AS DOUBLE))
                 + 0.3 * (length(regexp_replace(lower(text), '[^a-z]', '', 'g'))
                          / CAST(NULLIF(length(text), 0) AS DOUBLE)) + 1e-9, 4) AS quality
    FROM (SELECT doc_id, text, {_DUCK_TOKENS} AS toks FROM documents)
    """,
)
def tx04_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.quality_score(_documents(spark, sf_dir))


# ---------------------------------------------------------------------------
# quality / decontamination / packing (llmops.text) — the Gopher-style
# repetition signals, entropy scoring, benchmark-leak check, and
# concat-and-chunk training layout
# ---------------------------------------------------------------------------
_DUCK_2GRAMS = (
    "list_transform(generate_series(1, len(toks) - 1), "
    "i -> toks[i] || ' ' || toks[i+1])"
)
_DUCK_4GRAMS = (
    "list_transform(generate_series(1, len(toks) - 3), "
    "i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3])"
)


@query(
    "tx07_repetition_stats",
    doc="Gopher-style duplicate/top 2-gram fractions (llmops.text.ngram_repetition)",
    oracle=f"""
    WITH g AS (
      SELECT doc_id, unnest({_DUCK_2GRAMS}) AS gram
      FROM (SELECT doc_id, {_DUCK_TOKENS} AS toks FROM documents)
    ),
    c AS (SELECT doc_id, gram, COUNT(*) AS c FROM g GROUP BY 1, 2)
    SELECT doc_id,
           CAST(SUM(c) AS BIGINT) AS n_grams,
           ROUND(1 - COUNT(*) / CAST(SUM(c) AS DOUBLE) + 1e-9, 4) AS dup_gram_frac,
           ROUND(MAX(c) / CAST(SUM(c) AS DOUBLE) + 1e-9, 4) AS top_gram_frac
    FROM c GROUP BY doc_id
    """,
)
def tx07_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.ngram_repetition(_documents(spark, sf_dir), n=2)


@query(
    "tx08_token_entropy",
    doc="token-distribution Shannon entropy per doc (llmops.text.token_entropy)",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, unnest(toks) AS tok
      FROM (SELECT doc_id, {_DUCK_TOKENS} AS toks FROM documents)
    ),
    c AS (SELECT doc_id, tok, COUNT(*) AS c FROM t GROUP BY 1, 2)
    SELECT doc_id,
           CAST(SUM(c) AS BIGINT) AS n_tokens,
           ROUND(ln(CAST(SUM(c) AS DOUBLE))
                 - SUM(c * ln(CAST(c AS DOUBLE))) / CAST(SUM(c) AS DOUBLE)
                 + 1e-9, 4) AS entropy
    FROM c GROUP BY doc_id
    """,
)
def tx08_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.token_entropy(_documents(spark, sf_dir))


@query(
    "tx09_decontaminate",
    bench=True,
    doc="n-gram-overlap benchmark leak check: train (source<>src0) vs held-out "
    "src0 (llmops.text.contamination)",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, unnest(list_distinct({_DUCK_4GRAMS})) AS gram
      FROM (SELECT doc_id, {_DUCK_TOKENS} AS toks FROM documents
            WHERE source <> 'src0')
    ),
    b AS (
      SELECT doc_id AS bench_id, unnest(list_distinct({_DUCK_4GRAMS})) AS gram
      FROM (SELECT doc_id, {_DUCK_TOKENS} AS toks FROM documents
            WHERE source = 'src0')
    )
    SELECT t.doc_id,
           COUNT(DISTINCT t.gram) AS n_shared_grams,
           COUNT(DISTINCT b.bench_id) AS n_bench_docs
    FROM t JOIN b ON t.gram = b.gram
    GROUP BY t.doc_id
    """,
)
def tx09_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _documents(spark, sf_dir)
    return text.contamination(
        docs.filter(F.col("source") != "src0"),
        docs.filter(F.col("source") == "src0"),
        n=4,
    )


@query(
    "tx10_sequence_packing",
    doc="concat-and-chunk 512-token packing spans per source stream "
    "(llmops.text.pack_chunks)",
    oracle=f"""
    SELECT doc_id, source, n_tokens,
           CAST(off // 512 AS BIGINT) AS chunk_start,
           CAST((off + greatest(n_tokens, 1) - 1) // 512 AS BIGINT) AS chunk_end
    FROM (
      SELECT doc_id, source,
             CAST(len(toks) AS BIGINT) AS n_tokens,
             SUM(CAST(len(toks) AS BIGINT)) OVER (
               PARTITION BY source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) - len(toks) AS off
      FROM (SELECT doc_id, source, {_DUCK_TOKENS} AS toks FROM documents)
    )
    """,
)
def tx10_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.pack_chunks(_documents(spark, sf_dir), capacity=512)


@query(
    "sm03_temperature_mix",
    doc="alpha=0.5 temperature-reweighted language mixture at 50% volume "
    "(llmops.sampling.temperature_mixture_sample)",
    oracle=f"""
    WITH sizes AS (SELECT lang, COUNT(*) AS n_s FROM documents GROUP BY 1),
    tot AS (
      SELECT CAST(SUM(n_s) AS DOUBLE) AS n_total,
             SUM(sqrt(CAST(n_s AS DOUBLE))) AS w_total
      FROM sizes
    ),
    rates AS (
      SELECT lang,
             CAST(FLOOR(LEAST(1.0,
               0.5 * n_total * (sqrt(CAST(n_s AS DOUBLE)) / w_total)
               / CAST(n_s AS DOUBLE)) * 1000000) AS BIGINT) AS threshold
      FROM sizes, tot
    )
    SELECT d.lang, COUNT(*) AS n_kept
    -- null-safe: an unknown-language stratum is still a stratum (the
    -- operator samples it at its own rate); a plain equi-join would
    -- silently drop those documents
    FROM documents d JOIN rates r ON d.lang IS NOT DISTINCT FROM r.lang
    WHERE {_DUCK_BUCKET_OF.format(salt="s0", key="doc_id")} < r.threshold
    GROUP BY d.lang
    """,
)
def sm03_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    kept = sampling.temperature_mixture_sample(
        _documents(spark, sf_dir),
        key_col="doc_id",
        strata_col="lang",
        alpha=0.5,
        total_fraction=0.5,
    )
    return kept.groupBy("lang").agg(F.count(F.lit(1)).alias("n_kept"))


@query(
    "ss04_kmeans_clusters",
    doc="Lloyd k-means over embeddings: cluster sizes after 3 rounds "
    "(llmops.similarity.kmeans_lloyd); the Lloyd trajectory is replayed "
    "exactly as a recursive CTE — centroid rows per iteration, argmin "
    "assignment via lexicographic MIN(struct(sqdist, cluster)) (ties to "
    "the smaller cluster, matching the Spark window tie-break), update "
    "step a per-(cluster, dim) AVG re-assembled with list(ORDER BY pos)",
    oracle="""
    WITH RECURSIVE pts AS (
      -- vec_id is the vector key: duplicate ingests collapse before
      -- seeding, or LIMIT k would seed the same vector as two clusters
      SELECT DISTINCT vec_id, embedding::DOUBLE[] AS e FROM embeddings
    ),
    init AS (
      -- kmeans_lloyd seeds the first 8 vectors BY id and labels clusters
      -- by seed POSITION (0..7), not by vec_id — the two only coincide
      -- when ids are dense from 0 (caught by the gen_subset sweep)
      SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INT) AS cluster,
             e AS ce
      FROM pts ORDER BY vec_id LIMIT 8
    ),
    cent AS (
      SELECT 0 AS it, cluster, ce FROM init
      UNION ALL
      SELECT it, cluster, list(m ORDER BY pos) AS ce
      FROM (
        SELECT it, cluster, pos, AVG(x) AS m
        FROM (
          SELECT a.it, a.cluster, UNNEST(a.e) AS x,
                 generate_subscripts(a.e, 1) AS pos
          FROM (
            SELECT r.it + 1 AS it, p.vec_id, p.e,
                   (MIN(struct_pack(
                      sqd := list_sum(list_transform(list_zip(p.e, r.ce),
                                      z -> (z[1] - z[2]) * (z[1] - z[2]))),
                      cl := r.cluster))).cl AS cluster
            FROM pts p, cent r
            WHERE r.it < 3
            GROUP BY r.it + 1, p.vec_id, p.e
          ) a
        )
        GROUP BY it, cluster, pos
      )
      GROUP BY it, cluster
    ),
    final AS (
      SELECT p.vec_id,
             (MIN(struct_pack(
                sqd := list_sum(list_transform(list_zip(p.e, r.ce),
                                z -> (z[1] - z[2]) * (z[1] - z[2]))),
                cl := r.cluster))).cl AS cluster
      FROM pts p, cent r
      WHERE r.it = 3
      GROUP BY p.vec_id
    )
    SELECT cluster, COUNT(*) AS n_vectors FROM final GROUP BY cluster
    """,
)
def ss04_kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    # distinct vector grain, matching the oracle's DISTINCT (see note)
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    ).distinct()
    assigned = similarity.kmeans_lloyd(emb, k=8, max_iterations=3)
    return assigned.groupBy("cluster").agg(F.count(F.lit(1)).alias("n_vectors"))


# ---------------------------------------------------------------------------
# pipe01 — the full training-data pipeline as ONE oracle-checked plan:
# exact dedup → quality gate → benchmark decontamination → reproducible
# 50% sample → per-source token accounting.  Every stage is the library
# operator the standalone queries test; composing them stays a single
# DAG (semi/anti joins on doc_id, one gram join), so Catalyst sees the
# whole pipeline and prunes columns end-to-end — the corpus text column
# is read once, never materialized between "stages".
# ---------------------------------------------------------------------------
@query(
    "pipe01_training_mix",
    bench=True,
    doc="end-to-end corpus pipeline: dedup → quality ≥ 0.58 → decontaminate "
    "vs src0 → 50% hash sample → per-source doc/token counts",
    oracle=f"""
    WITH train AS (SELECT * FROM documents WHERE source <> 'src0'),
    keepers AS (
      SELECT MIN(doc_id) AS doc_id FROM train GROUP BY md5(text)
    ),
    dd AS (SELECT t.* FROM train t JOIN keepers k ON t.doc_id = k.doc_id),
    toksd AS (SELECT doc_id, source, text, {_DUCK_TOKENS} AS toks FROM dd),
    qd AS (
      SELECT * FROM toksd
      WHERE ROUND(0.4 * LEAST(1.0, len(toks) / 100.0)
            + 0.3 * (len(list_distinct(toks)) / CAST(NULLIF(len(toks), 0) AS DOUBLE))
            + 0.3 * (length(regexp_replace(lower(text), '[^a-z]', '', 'g'))
                     / CAST(NULLIF(length(text), 0) AS DOUBLE)) + 1e-9, 4) >= 0.58
    ),
    tgrams AS (
      SELECT doc_id, unnest(list_distinct({_DUCK_4GRAMS})) AS gram FROM qd
    ),
    bgrams AS (
      SELECT unnest(list_distinct({_DUCK_4GRAMS})) AS gram
      FROM (SELECT {_DUCK_TOKENS} AS toks FROM documents WHERE source = 'src0')
    ),
    contaminated AS (
      SELECT DISTINCT t.doc_id FROM tgrams t JOIN bgrams b ON t.gram = b.gram
    ),
    clean AS (
      SELECT * FROM qd WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)
    ),
    sampled AS (
      SELECT * FROM clean
      WHERE {_DUCK_BUCKET_OF.format(salt="s0", key="doc_id")} < 500000
    )
    SELECT source, COUNT(*) AS n_docs,
           CAST(SUM(len(toks)) AS BIGINT) AS ws_tokens
    FROM sampled GROUP BY source
    """,
)
def pipe01_training_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _documents(spark, sf_dir)
    train = docs.filter(F.col("source") != "src0")
    bench_docs = docs.filter(F.col("source") == "src0")
    # one corpus pass: the deduped corpus feeds quality, decontamination
    # and sampling — without the checkpoint each replays the scan +
    # dedup shuffle (9 scans in the executed plan; pipe03 precedent).
    # Round 10: the checkpoint carries the token array, so the quality
    # gate, the contamination shingles and the final token count all
    # read it instead of re-tokenizing (3 passes → 1), and the quality
    # gate is a row-local FILTER instead of a score + semi-join back
    # (doc_id is the dedup keeper key — filter ≡ semi join on a key
    # column, minus one exchange).  Invariant the equivalence leans on:
    # after drop_exact_duplicates the fixture corpus has one row per
    # doc_id (duplicate ingests are exact full-row copies, so the
    # keeper semi-join collapses them).  A corpus with the SAME doc_id
    # on DIFFERENT texts would diverge — there the old semi-join kept
    # every copy once any copy passed; the t76/d31 dup corpora pin the
    # exact-copy case.
    deduped = (
        dedup.drop_exact_duplicates(train)
        .withColumn("toks", dedup.tokens("text"))
        .localCheckpoint(eager=False)
    )
    kept = deduped.filter(text.quality_column("text", "toks") >= 0.58)
    contaminated = text.contamination(
        kept, bench_docs, n=4, train_toks_col="toks"
    ).select("doc_id")
    clean = kept.join(contaminated, "doc_id", "left_anti")
    sampled = sampling.hash_sample(clean, key_col="doc_id", fraction=0.5)
    return (
        sampled.withColumn("ws_tokens", F.size("toks").cast("long"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("ws_tokens").alias("ws_tokens"),
        )
    )


@query(
    "sm04_quality_weighted_sample",
    doc="importance sampling with keep-probability = quality score "
    "(llmops.sampling.weighted_hash_sample)",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id, source,
             ROUND(0.4 * LEAST(1.0, len(toks) / 100.0)
                   + 0.3 * (len(list_distinct(toks)) / CAST(NULLIF(len(toks), 0) AS DOUBLE))
                   + 0.3 * (length(regexp_replace(lower(text), '[^a-z]', '', 'g'))
                            / CAST(NULLIF(length(text), 0) AS DOUBLE)) + 1e-9, 4) AS quality
      -- distinct document grain: duplicate ingests must not be sampled
      -- (and counted) twice
      FROM (SELECT doc_id, source, text, {_DUCK_TOKENS} AS toks
            FROM (SELECT DISTINCT doc_id, source, text FROM documents))
    )
    SELECT source, COUNT(*) AS n_kept
    FROM scored
    WHERE {_DUCK_BUCKET_OF.format(salt="s0", key="doc_id")} <
          CAST(FLOOR(LEAST(1.0, GREATEST(0.0, quality)) * 1000000) AS BIGINT)
    GROUP BY source
    """,
)
def sm04_quality_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    # distinct document grain (see oracle note) — also keeps the
    # doc_id join 1:1 instead of fanning out duplicate ingests;
    # localCheckpoint = one corpus pass for both consumers (see pipe03)
    docs = (
        _documents(spark, sf_dir)
        .select("doc_id", "source", "text")
        .distinct()
        .localCheckpoint(eager=False)
    )
    scored = docs.join(text.quality_score(docs), "doc_id")
    kept = sampling.weighted_hash_sample(
        scored, key_col="doc_id", weight_col="quality"
    )
    return kept.groupBy("source").agg(F.count(F.lit(1)).alias("n_kept"))


@query(
    "dd09_containment",
    doc="asymmetric n-gram containment pairs — subset/quote-inclusion "
    "near-dups Jaccard misses (llmops.dedup.containment_pairs)",
    oracle=f"""
    WITH sh AS ({_DUCK_DOC_SHINGLES}),
    sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY 1),
    common AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT c.doc_a, c.doc_b,
           ROUND(CAST(c.n_common AS DOUBLE) / LEAST(sa.n_sh, sb.n_sh), 4)
             AS containment
    FROM common c
    JOIN sizes sa ON sa.doc_id = c.doc_a
    JOIN sizes sb ON sb.doc_id = c.doc_b
    WHERE CAST(c.n_common AS DOUBLE) / LEAST(sa.n_sh, sb.n_sh) >= 0.12
    """,
)
def dd09_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.containment_pairs(_documents(spark, sf_dir), threshold=0.12)


@query(
    "dd08_incremental_dedup",
    doc="incremental ingestion dedup: new batch (src1x sources) against the "
    "existing corpus (llmops.dedup.drop_duplicates_against)",
    oracle="""
    WITH corpus AS (
      SELECT DISTINCT ('0x' || substr(md5(text), 1, 15))::BIGINT AS ch
      FROM documents WHERE source NOT LIKE 'src1%' AND text IS NOT NULL
    ),
    batch AS (
      SELECT doc_id, source,
             ('0x' || substr(md5(text), 1, 15))::BIGINT AS ch,
             ROW_NUMBER() OVER (PARTITION BY ('0x' || substr(md5(text), 1, 15))::BIGINT
                                ORDER BY doc_id) AS rn
      FROM documents WHERE source LIKE 'src1%' AND text IS NOT NULL
    )
    -- NOT EXISTS, never NOT IN: one NULL hash in the corpus set makes
    -- NOT IN three-valued-logic-empty the ENTIRE result.  NULL-text
    -- batch rows pass through (no content hash -> not provably dup),
    -- matching drop_duplicates_against.
    SELECT b.doc_id, b.source
    FROM batch b
    WHERE b.rn = 1 AND NOT EXISTS (SELECT 1 FROM corpus c WHERE c.ch = b.ch)
    UNION ALL
    SELECT doc_id, source FROM documents
    WHERE source LIKE 'src1%' AND text IS NULL
    """,
)
def dd08_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _documents(spark, sf_dir)
    new = docs.filter(F.col("source").like("src1%"))
    corpus = docs.filter(~F.col("source").like("src1%"))
    return dedup.drop_duplicates_against(new, corpus).select("doc_id", "source")


@query(
    "ss05_doc_pagerank",
    doc="PageRank over the embedding near-dup graph: hub documents whose "
    "content radiates through the corpus (operators.graph.pagerank); the "
    "power iteration is replayed exactly as a recursive CTE (the "
    "symmetrized graph has no dangling nodes, so the per-round mass "
    "redistribution is pure edge contributions + teleport)",
    oracle=f"""
    WITH RECURSIVE v AS (
      SELECT vec_id, e, {_DUCK_BUCKET} AS bucket,
             sqrt(list_sum(list_transform(e, x -> x * x))) AS nrm
      FROM (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings)
    ),
    pairs AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b
      FROM v a JOIN v b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
      WHERE ROUND(list_dot_product(a.e, b.e) / (a.nrm * b.nrm), 6) >= 0.2
    ),
    e AS (
      SELECT DISTINCT u, v FROM (
        SELECT id_a AS u, id_b AS v FROM pairs
        UNION ALL SELECT id_b, id_a FROM pairs)
    ),
    nodes AS (SELECT DISTINCT u AS node FROM e),
    nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),
    deg AS (SELECT u, COUNT(*) AS deg FROM e GROUP BY u),
    pr AS (
      SELECT 0 AS it, node, 1.0 / (SELECT n FROM nn) AS rank FROM nodes
      UNION ALL
      SELECT p.it + 1, e.v AS node,
             (CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / (SELECT n FROM nn)
               + CAST(0.85 AS DOUBLE) * SUM(p.rank / d.deg)
      FROM pr p JOIN e ON e.u = p.node JOIN deg d ON d.u = p.node
      WHERE p.it < 5
      GROUP BY p.it + 1, e.v
    )
    SELECT node, ROUND(rank, 6) AS rank FROM pr WHERE it = 5
    """,
)
def ss05_doc_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_batch_spark.operators.graph import pagerank

    emb = load_table(spark, sf_dir, "embeddings")
    pairs = similarity.neardup_pairs(emb, threshold=0.2)
    edges = pairs.select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    ).union(pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst")))
    return pagerank(edges, max_iterations=5)


@query(
    "mm03_window_energy",
    doc="windowed payload energy (audio-frame shape) via Arrow-batched "
    "mapInPandas (llmops.multimodal.window_energy)",
    oracle="""
    WITH d AS (
      -- the operator frames the UTF-8 PAYLOAD BYTES, not characters:
      -- hex(encode(text)) exposes the byte sequence to SQL (byte i is
      -- the i-th hex pair), where ord(substr(text, i, 1)) would read
      -- CODE POINTS — unbounded values and wrong frame boundaries the
      -- moment the text is non-ASCII
      SELECT doc_id, hex(encode(text)) AS hx,
             octet_length(encode(text)) AS n
      FROM documents WHERE text IS NOT NULL AND octet_length(encode(text)) > 0
    ),
    w AS (
      SELECT doc_id, hx, n,
             unnest(generate_series(0, CAST((n - 1) // 128 AS INT))) AS widx
      FROM d
    )
    SELECT doc_id, CAST(widx AS INT) AS widx,
           ROUND(list_avg(list_transform(
                   generate_series(widx * 128 + 1, LEAST(widx * 128 + 256, n)),
                   i -> ('0x' || substr(hx, 2 * i - 1, 2))::INT))
                 / 255.0 + 1e-9, 6) AS energy
    FROM w
    """,
)
def mm03_window_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = multimodal.attach_payload(
        _documents(spark, sf_dir), modality="audio", mime="audio/pcm"
    )
    return multimodal.window_energy(docs, win=256, hop=128)


@query(
    "sm05_fixed_quota_sample",
    doc="exactly-5-per-source deterministic carve-out "
    "(llmops.sampling.fixed_quota_sample)",
    oracle=f"""
    SELECT doc_id, source
    FROM (
      SELECT doc_id, source,
             ROW_NUMBER() OVER (
               PARTITION BY source
               ORDER BY {_DUCK_BUCKET_OF.format(salt="s0", key="doc_id")}, doc_id
             ) AS rk
      FROM documents
    )
    WHERE rk <= 5
    """,
)
def sm05_fixed_quota_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _documents(spark, sf_dir).select("doc_id", "source")
    return sampling.fixed_quota_sample(
        docs, key_col="doc_id", strata_col="source", n_per_stratum=5
    )


@query(
    "sm06_training_shards",
    doc="deterministic global shuffle into training shards "
    "(llmops.sampling.shard_assign): hash placement, order-independent",
    oracle=f"""
    SELECT CAST({_DUCK_H60.format(expr="'shard' || '|' || CAST(doc_id AS VARCHAR)")} % 16
                AS INT) AS shard,
           COUNT(*) AS n_docs,
           CAST(SUM(doc_id) AS BIGINT) AS sum_ids
    FROM documents
    GROUP BY 1
    """,
)
def sm06_training_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _documents(spark, sf_dir)
    return (
        sampling.shard_assign(docs, key_col="doc_id", n_shards=16)
        .groupBy("shard")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("doc_id").alias("sum_ids"))
    )


@query(
    "tx12_batch_inference",
    doc="Arrow-batched model scoring over documents: a fixed logistic "
    "quality model applied via pandas UDF (the batch-inference plumbing "
    "for any real classifier)",
    oracle="""
    -- length(text), not the fixture n_chars column: the operator
    -- featurizes from the text itself.  '[\\s\\x0B]+' = Java regex \\s
    -- (RE2's \\s lacks vertical tab) — the engine-wide ASCII token
    -- contract.
    SELECT doc_id,
           ROUND(1.0 / (1.0 + EXP(-(
             -1.5
             + 0.004 * LEAST(length(text), 2000)
             + 0.02  * LEAST(len(list_filter(string_split_regex(text, '[\\s\\x0B]+'),
                                             x -> x <> '')), 400)
             - 2.0   * (len(regexp_extract_all(text, '[0-9]')) /
                        GREATEST(length(text), 1))
           ))), 6) AS score
    FROM documents
    """,
)
def tx12_batch_inference(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.score_batch(_documents(spark, sf_dir))


@query(
    "ss06_array_lambda_surface",
    doc="higher-order lambda surface (transform/filter/exists/aggregate/"
    "array_sort) over the embedding vectors in one codegen projection",
    oracle="""
    SELECT vec_id,
           CAST(len(embedding) AS INT) AS dim,
           ROUND(sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x))), 4)
             AS l2,
           CAST(len(list_filter(embedding::DOUBLE[], x -> x > 0)) AS INT) AS n_pos,
           len(list_filter(embedding::DOUBLE[], x -> x > 0.25)) > 0 AS has_big,
           ROUND(list_sum(list_transform(embedding::DOUBLE[],
                                         x -> CASE WHEN x < 0 THEN 0 ELSE x END)), 4)
             AS sum_clipped,
           ROUND(list_sort(embedding::DOUBLE[])[1], 6) AS min_v
    FROM embeddings WHERE vec_id % 20 = 0
    """,
)
def ss06_array_lambda_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") % 20 == 0)
    e = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    sq_sum = F.aggregate(
        e, F.lit(0.0), lambda acc, x: acc + x * x
    )
    clipped_sum = F.aggregate(
        e, F.lit(0.0), lambda acc, x: acc + F.when(x < 0, F.lit(0.0)).otherwise(x)
    )
    return emb.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(F.sqrt(sq_sum), 4).alias("l2"),
        F.size(F.filter(e, lambda x: x > 0)).alias("n_pos"),
        F.exists(e, lambda x: x > 0.25).alias("has_big"),
        F.round(clipped_sum, 4).alias("sum_clipped"),
        F.round(F.element_at(F.array_sort(e), 1), 6).alias("min_v"),
    )


@query(
    "sm07_weighted_topk_sample",
    doc="exactly-k weighted sample without replacement, Efraimidis–"
    "Spirakis priorities (llmops.sampling.weighted_topk_sample)",
    oracle=f"""
    SELECT doc_id, source, n_chars, ROUND(p, 6) AS priority
    FROM (
      SELECT doc_id, source, n_chars,
             pow(({_DUCK_BUCKET_OF.format(salt="s0", key="doc_id")} + 0.5)
                 / 1000000.0,
                 1.0 / (n_chars / 100.0)) AS p
      FROM documents
      WHERE n_chars > 0
      ORDER BY p DESC, doc_id
      LIMIT 50
    ) t
    """,
)
def sm07_weighted_topk_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _documents(spark, sf_dir).select(
        "doc_id", "source", "n_chars", (F.col("n_chars") / 100.0).alias("w")
    )
    out = sampling.weighted_topk_sample(docs, key_col="doc_id", weight_col="w", k=50)
    return out.select("doc_id", "source", "n_chars", "priority")


@query(
    "tx13_regexp_surface",
    doc="regexp function surface (count/extract/extract_all/replace/like) "
    "in one codegen projection over documents",
    oracle="""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '[0-9]')) AS INT) AS n_digits,
           CAST(len(regexp_extract_all(text, '[aeiou]{2,}')) AS INT) AS n_vowel_runs,
           regexp_extract(text, '\\b(\\w{7,})\\b', 1) AS first_long_word,
           regexp_matches(text, '(?i)\\bthe\\b') AS has_the,
           substr(regexp_replace(text, '[0-9]+', '#', 'g'), 1, 40) AS masked_head
    FROM documents WHERE doc_id % 10 = 0
    """,
)
def tx13_regexp_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _documents(spark, sf_dir).filter(F.col("doc_id") % 10 == 0)
    t = F.col("text")
    return d.select(
        "doc_id",
        F.regexp_count(t, F.lit("[0-9]")).cast("int").alias("n_digits"),
        F.regexp_count(t, F.lit("[aeiou]{2,}")).cast("int").alias("n_vowel_runs"),
        F.regexp_extract(t, r"\b(\w{7,})\b", 1).alias("first_long_word"),
        t.rlike(r"(?i)\bthe\b").alias("has_the"),
        F.substring(F.regexp_replace(t, "[0-9]+", "#"), 1, 40).alias("masked_head"),
    )


@query(
    "ss07_mmr_topk",
    doc="maximal-marginal-relevance diversified top-5 for 10 query "
    "vectors (llmops.similarity.mmr_topk); the greedy pick is replayed "
    "exactly as a per-query recursive CTE over 6dp-rounded sims",
    oracle="""
    WITH RECURSIVE v AS (
      SELECT vec_id, embedding::DOUBLE[] AS e,
             sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x))) AS nrm
      FROM embeddings
    ),
    pool AS (  -- cosine_topk(pool=20): 6dp-rounded cosine, id tie-break
      SELECT query_id, neighbor_id, cosine
      FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                         ORDER BY cosine DESC, neighbor_id) AS rn
            FROM (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                         ROUND(list_dot_product(q.e, c.e) / (q.nrm * c.nrm), 6) AS cosine
                  FROM v q JOIN v c ON c.vec_id <> q.vec_id
                  WHERE q.vec_id < 10))
      WHERE rn <= 20
    ),
    sims AS (  -- pairwise candidate sims within each pool, same rounding
      SELECT a.query_id, a.neighbor_id AS ai, b.neighbor_id AS bi,
             ROUND(list_dot_product(va.e, vb.e) / (va.nrm * vb.nrm), 6) AS sim
      FROM pool a
      JOIN pool b ON a.query_id = b.query_id AND a.neighbor_id <> b.neighbor_id
      JOIN v va ON va.vec_id = a.neighbor_id
      JOIN v vb ON vb.vec_id = b.neighbor_id
    ),
    rec AS (  -- greedy: argmax(0.5*rel - 0.5*max sim to selected)
      SELECT q.query_id, 1 AS rank, t.neighbor_id, t.mmr AS mmr_score,
             [t.neighbor_id] AS sel
      FROM (SELECT DISTINCT query_id FROM pool) q,
      LATERAL (SELECT neighbor_id, 0.5 * cosine AS mmr FROM pool c
               WHERE c.query_id = q.query_id
               ORDER BY mmr DESC, neighbor_id LIMIT 1) t
      UNION ALL
      SELECT r.query_id, r.rank + 1, t.neighbor_id, t.mmr,
             list_append(r.sel, t.neighbor_id)
      FROM rec r,
      LATERAL (
        SELECT c.neighbor_id,
               0.5 * c.cosine - 0.5 * (
                 SELECT MAX(s.sim) FROM sims s
                 WHERE s.query_id = r.query_id AND s.ai = c.neighbor_id
                   AND list_contains(r.sel, s.bi)
               ) AS mmr
        FROM pool c
        WHERE c.query_id = r.query_id AND NOT list_contains(r.sel, c.neighbor_id)
        ORDER BY mmr DESC, c.neighbor_id LIMIT 1
      ) t
      WHERE r.rank < 5
    )
    SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank, mmr_score
    FROM rec
    """,
)
def ss07_mmr_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.mmr_topk(emb, emb.filter(F.col("vec_id") < 10), k=5, pool=20)


# ---------------------------------------------------------------------------
# tx14 — BM25 keyword search (Okapi, Lucene idf): the lexical-retrieval
# counterpart to ss01-ss03's vector ANN.  Tokens are filtered to the
# query terms before the (doc, term) shuffle; doc length rides through
# the explode; N/avgdl/df are broadcasts; top-k is TakeOrdered.
# ---------------------------------------------------------------------------
_BM25_TERMS = ("spark", "join", "merge", "window")


@query(
    "tx14_bm25_search",
    bench=True,
    doc="Okapi BM25 top-10 keyword search over documents",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {_DUCK_TOKENS} AS toks FROM documents
    ),
    hits AS (
      SELECT doc_id, len(toks)::DOUBLE AS dl, UNNEST(toks) AS term
      FROM toks
    ),
    tf AS (
      SELECT doc_id, term, COUNT(*)::DOUBLE AS tf, FIRST(dl) AS dl
      FROM hits WHERE term IN ('spark', 'join', 'merge', 'window')
      GROUP BY doc_id, term
    ),
    corpus AS (
      SELECT (SELECT COUNT(*)::DOUBLE FROM documents) AS n_docs,
             (SELECT AVG(len(toks)::DOUBLE) FROM toks) AS avgdl
    ),
    dfreq AS (
      SELECT term, COUNT(*)::DOUBLE AS df FROM tf GROUP BY term
    )
    SELECT doc_id,
           ROUND(SUM(
             ln(1.0 + (c.n_docs - d.df + 0.5) / (d.df + 0.5))
             * t.tf * 2.2
             / (t.tf + 1.2 * (0.25 + 0.75 * t.dl / c.avgdl))
           ), 6) AS score
    FROM tf t JOIN dfreq d USING (term) CROSS JOIN corpus c
    GROUP BY doc_id
    ORDER BY score DESC, doc_id ASC
    LIMIT 10
    """,
)
def tx14_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.bm25_topk(_documents(spark, sf_dir), list(_BM25_TERMS), k=10)


# ---------------------------------------------------------------------------
# tx15 — RAG chunking: split each document into token windows of 32
# with stride 24 (8-token overlap), the standard retrieval-corpus
# preparation.  Pure higher-order array functions — tokenize once,
# generate chunk starts with sequence(), slice per start — a narrow
# (shuffle-free) per-row expansion that scales embarrassingly; the
# chunk explosion multiplies rows ~n_tokens/stride, the expected output
# shape for an embedding stage downstream.
# ---------------------------------------------------------------------------
_CHUNK, _STRIDE = 32, 24


@query(
    "tx15_rag_chunks",
    bench=True,
    doc="sliding-window token chunking (size 32, stride 24)",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {_DUCK_TOKENS} AS toks FROM documents
    ),
    starts AS (
      SELECT doc_id, toks, UNNEST(generate_series(0, len(toks) - 1, {_STRIDE}))
               AS start
      FROM toks WHERE len(toks) > 0
    )
    SELECT doc_id,
           CAST(start // {_STRIDE} AS INT) AS chunk_idx,
           CAST(LEAST({_CHUNK}, len(toks) - start) AS INT) AS n_tokens,
           array_to_string(list_slice(toks, start + 1, start + {_CHUNK}), ' ')
             AS chunk_text
    FROM starts
    WHERE start = 0 OR start - {_STRIDE} + {_CHUNK} < len(toks)
    """,
)
def tx15_rag_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.chunk_tokens(
        _documents(spark, sf_dir), size=_CHUNK, stride=_STRIDE
    )


# ---------------------------------------------------------------------------
# tx16 — inverted-index build (posting lists): per term its document
# frequency, total term frequency, and the top-5 posting doc_ids by
# tf.  This is the amortization path for repeated keyword search: build
# once (one (doc, term) shuffle), then every tx14-style BM25 query is a
# broadcast lookup instead of a corpus scan.  Posting lists here are
# top-5 arrays — bounded per term by construction, never a full
# collect of a hot term's postings.
# ---------------------------------------------------------------------------
_IDX_TERMS = ("spark", "join", "merge", "window", "stream", "batch")


@query(
    "tx16_inverted_postings",
    doc="inverted-index posting lists (df, tf, top-5 docs per term)",
    oracle=f"""
    WITH hits AS (
      SELECT doc_id, UNNEST({_DUCK_TOKENS}) AS term FROM documents
    ),
    tf AS (
      SELECT term, doc_id, COUNT(*) AS tf
      FROM hits
      WHERE term IN ('spark', 'join', 'merge', 'window', 'stream', 'batch')
      GROUP BY term, doc_id
    )
    SELECT term,
           COUNT(*) AS df,
           CAST(SUM(tf) AS BIGINT) AS total_tf,
           -- comma-joined string, not LIST: the external driver canonicalizes
           -- via pandas, which cannot hash list cells
           array_to_string(
             list_transform((list(doc_id ORDER BY tf DESC, doc_id ASC))[1:5],
                            x -> CAST(x AS VARCHAR)),
             ','
           ) AS top_docs
    FROM tf GROUP BY term
    """,
)
def tx16_inverted_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_batch_spark.catalog import fan_out
    from etl_batch_spark.llmops.dedup import tokens

    terms = F.array(*[F.lit(t) for t in _IDX_TERMS])
    hits = (
        fan_out(_documents(spark, sf_dir))
        .select("doc_id", tokens("text").alias("toks"))
        .select(
            "doc_id",
            F.explode(F.filter("toks", lambda t: F.array_contains(terms, t))).alias(
                "term"
            ),
        )
    )
    tf = hits.groupBy("term", "doc_id").agg(F.count(F.lit(1)).alias("tf"))
    return tf.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"),
        F.sum("tf").alias("total_tf"),
        F.array_join(
            F.slice(
                F.transform(
                    F.array_sort(F.collect_list(F.struct((-F.col("tf")).alias("neg"), "doc_id"))),
                    lambda s: s.doc_id.cast("string"),
                ),
                1,
                5,
            ),
            ",",
        ).alias("top_docs"),
    )


@query(
    "tx17_bigram_lm_score",
    doc="self-scored bigram LM fluency: Laplace-smoothed log10 probs in "
    "exact centi-units (llmops.text.bigram_lm_score)",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, {_DUCK_TOKENS} AS toks FROM documents
    ),
    t2 AS (SELECT doc_id, toks FROM t WHERE len(toks) >= 2),
    bg AS (
      SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2
      FROM (SELECT doc_id, toks,
                   UNNEST(generate_series(1, len(toks) - 1)) AS i
            FROM t2)
    ),
    c2 AS (SELECT w1, w2, COUNT(*) AS c12 FROM bg GROUP BY 1, 2),
    c1 AS (SELECT w1, COUNT(*) AS c1 FROM bg GROUP BY 1),
    vocab AS (
      SELECT COUNT(DISTINCT tok) AS v
      FROM (SELECT UNNEST(toks) AS tok FROM t2)
    ),
    scored AS (
      SELECT bg.doc_id,
             CAST(round((log10(CAST(c2.c12 + 1 AS DOUBLE))
                         - log10(CAST(c1.c1 + vocab.v AS DOUBLE))) * 100, 0)
                  AS BIGINT) AS logp_centi
      FROM bg JOIN c2 USING (w1, w2) JOIN c1 USING (w1) CROSS JOIN vocab
    )
    SELECT doc_id,
           COUNT(*) AS n_bigrams,
           CAST(SUM(logp_centi) AS BIGINT) AS sum_logp_centi,
           ROUND(CAST(SUM(logp_centi) AS DOUBLE) / 100.0 / COUNT(*), 3) AS avg_logp
    FROM scored GROUP BY doc_id
    """,
)
def tx17_bigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.bigram_lm_score(_documents(spark, sf_dir))


@query(
    "tx18_nextfit_packing",
    doc="next-fit-decreasing whole-doc bin packing per hash shard, "
    "capacity 256 (llmops.text.pack_nextfit); oracle replays the walk "
    "as a per-shard recursive CTE",
    oracle=f"""
    WITH RECURSIVE base AS (
      -- NULL-text docs have no token count; pack_nextfit skips them
      SELECT doc_id,
             CAST(len({_DUCK_TOKENS}) AS BIGINT) AS n_tok,
             CAST((('0x' || substr(md5('pack|' || CAST(doc_id AS VARCHAR)), 1, 15))
                   ::BIGINT % 4) AS INT) AS shard
      FROM documents WHERE text IS NOT NULL
    ),
    ordered AS (
      SELECT doc_id, n_tok, shard,
             ROW_NUMBER() OVER (PARTITION BY shard ORDER BY n_tok DESC, doc_id)
               AS rn
      FROM base
    ),
    rec AS (
      SELECT doc_id, shard, n_tok, rn, 1 AS bin, n_tok AS fill_after
      FROM ordered WHERE rn = 1
      UNION ALL
      SELECT o.doc_id, o.shard, o.n_tok, o.rn,
             CASE WHEN r.fill_after + o.n_tok > 256 THEN r.bin + 1
                  ELSE r.bin END,
             CASE WHEN r.fill_after + o.n_tok > 256 THEN o.n_tok
                  ELSE r.fill_after + o.n_tok END
      FROM rec r JOIN ordered o ON o.shard = r.shard AND o.rn = r.rn + 1
    )
    SELECT doc_id, shard, n_tok, CAST(bin AS INT) AS bin, fill_after FROM rec
    """,
)
def tx18_nextfit_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.pack_nextfit(
        _documents(spark, sf_dir), capacity=256, n_shards=4
    )


# ---------------------------------------------------------------------------
# tx19 — exact frequent-vocabulary mining (operators/freq.py): every
# token with corpus frequency ≥ φ·N, computed with per-partition
# Misra–Gries candidate summaries + a broadcast-semi-join exact recount
# instead of a groupBy over ALL distinct tokens.  At 100 TB the distinct
# vocabulary dwarfs the ≤ 1/φ possible answers; the sketch only
# PROPOSES candidates (provable superset), the recount DECIDES — so the
# result is exact and the oracle is a plain GROUP BY ... HAVING.
# ---------------------------------------------------------------------------
@query(
    "tx19_vocab_heavy_hitters",
    bench=True,
    doc="exact frequent tokens ≥ 0.2% of corpus via Misra–Gries "
    "candidates + exact recount (operators.freq.frequent_items)",
    oracle=f"""
    WITH w AS (
      SELECT UNNEST({_DUCK_TOKENS}) AS word FROM documents
    ),
    tot AS (SELECT COUNT(*) AS n_total FROM w)
    SELECT w.word, COUNT(*) AS n,
           CAST(CEIL(0.002 * tot.n_total) AS BIGINT) AS threshold
    FROM w, tot
    GROUP BY w.word, tot.n_total
    HAVING COUNT(*) >= CEIL(0.002 * tot.n_total)
    """,
)
def tx19_vocab_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_batch_spark.operators.freq import frequent_items

    words = _documents(spark, sf_dir).select(
        F.explode(dedup.tokens("text")).alias("word")
    )
    return frequent_items(words, "word", support=0.002)


# ---------------------------------------------------------------------------
# tx20 — hashing-trick features (llmops.text.feature_hash): fixed
# 32-dim sparse bag-of-tokens with the unbiasing ±1 sign hash — the
# vocabulary-free featurizer linear models train on at 100 TB (no fit
# state, no dictionary shuffle).  md5-derived index and sign hashes
# keep every vector bit-identical across engines.
# ---------------------------------------------------------------------------
@query(
    "tx20_feature_hashing",
    doc="hashing-trick sparse features, 32 dims + sign hash "
    "(llmops.text.feature_hash)",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, UNNEST({_DUCK_TOKENS}) AS tok
      FROM documents WHERE doc_id < 100
    )
    SELECT doc_id,
           {_DUCK_H60.format(expr="tok")} % 32 AS feature,
           COUNT(*) AS tf,
           CAST(SUM(CASE WHEN ('0x' || substr(md5(tok), 16, 1))::BIGINT % 2 = 0
                         THEN 1 ELSE -1 END) AS BIGINT) AS signed_tf
    FROM toks
    GROUP BY 1, 2
    """,
)
def tx20_feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _documents(spark, sf_dir).filter(F.col("doc_id") < 100)
    return text.feature_hash(docs, n_features=32)


# ---------------------------------------------------------------------------
# ss08 — per-label centroids: element-wise mean of the embedding
# vectors per label, plus the centroid L2 norm.  The scale shape is
# posexplode → (label, dim) partial-aggregated avg → re-assemble — one
# shuffle on a (|labels| × 64)-key space regardless of corpus size,
# never a whole-vector reduce on one task.  Oracle replays with
# UNNEST WITH ORDINALITY.  Output dims are capped to the first 8 for a
# readable contract (the aggregation runs over all 64).
# ---------------------------------------------------------------------------
@query(
    "ss08_label_centroids",
    oracle="""
    WITH dims AS (
      SELECT label, UNNEST(embedding) AS v,
             generate_subscripts(embedding, 1) AS pos
      FROM embeddings
    ),
    cent AS (
      SELECT label, pos, AVG(v) AS c, COUNT(*) AS n
      FROM dims GROUP BY label, pos
    )
    SELECT label,
           CAST(MAX(n) AS BIGINT) AS n_vectors,
           ROUND(sqrt(SUM(c * c)), 6) AS centroid_norm,
           -- fixed %.6f string, not LIST: the external driver canonicalizes
           -- via pandas, which cannot hash list cells; printf keeps the float
           -- repr byte-identical between DuckDB and Spark
           array_to_string(
             list_transform((list(c ORDER BY pos))[1:8], x -> printf('%.6f', x)),
             ','
           ) AS centroid_head
    FROM cent GROUP BY label
    """,
)
def ss08_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    dims = emb.select("label", F.posexplode("embedding").alias("pos", "v"))
    cent = dims.groupBy("label", "pos").agg(
        F.avg("v").alias("c"), F.count(F.lit(1)).alias("n")
    )
    return cent.groupBy("label").agg(
        F.max("n").cast("bigint").alias("n_vectors"),
        F.round(F.sqrt(F.sum(F.col("c") * F.col("c"))), 6).alias("centroid_norm"),
        F.array_join(
            F.slice(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "c"))),
                    lambda s: F.format_string("%.6f", s.c),
                ),
                1,
                8,
            ),
            ",",
        ).alias("centroid_head"),
    )


# ---------------------------------------------------------------------------
# ss09 — nearest-centroid classification, reported as a confusion
# matrix (true label × predicted label).  Centroids (ss08's shape) are
# a |labels|-row broadcast; every vector scores against all centroids
# with a zip_with dot product and picks argmax cosine via one window
# on vec_id.  Cosines round to 6dp BEFORE ranking so Spark and DuckDB
# break float ties identically (then by smaller label).  At scale:
# fact-side stays partition-parallel, centroid side is O(|labels|·dim).
# ---------------------------------------------------------------------------
@query(
    "ss09_centroid_confusion",
    oracle="""
    WITH v AS (
      SELECT vec_id, label, embedding::DOUBLE[] AS e,
             sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
      FROM embeddings
    ),
    dims AS (
      SELECT label, UNNEST(e) AS x, generate_subscripts(e, 1) AS pos FROM v
    ),
    cent AS (
      SELECT label AS clabel, list(c ORDER BY pos) AS ce
      FROM (SELECT label, pos, AVG(x) AS c FROM dims GROUP BY label, pos)
      GROUP BY label
    ),
    cnorm AS (
      SELECT clabel, ce, sqrt(list_dot_product(ce, ce)) AS cnrm FROM cent
    ),
    scored AS (
      SELECT v.vec_id, v.label, c.clabel,
             ROUND(list_dot_product(v.e, c.ce) / (v.nrm * c.cnrm), 6) AS cos,
             ROW_NUMBER() OVER (
               PARTITION BY v.vec_id
               ORDER BY ROUND(list_dot_product(v.e, c.ce) / (v.nrm * c.cnrm), 6)
                        DESC, c.clabel ASC
             ) AS rk
      FROM v CROSS JOIN cnorm c
    )
    SELECT label, clabel AS pred_label, COUNT(*) AS n
    FROM scored WHERE rk = 1
    GROUP BY label, clabel
    """,
)
def ss09_centroid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        "label",
        F.transform("embedding", lambda x: x.cast("double")).alias("e"),
    )
    dot = lambda a, b: F.aggregate(  # noqa: E731
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    v = emb.withColumn("nrm", F.sqrt(dot(F.col("e"), F.col("e"))))
    dims = emb.select("label", F.posexplode("e").alias("pos", "x"))
    cent = (
        dims.groupBy("label", "pos")
        .agg(F.avg("x").alias("c"))
        .groupBy(F.col("label").alias("clabel"))
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "c"))), lambda s: s.c
            ).alias("ce")
        )
        .withColumn("cnrm", F.sqrt(dot(F.col("ce"), F.col("ce"))))
    )
    cos = F.round(dot(F.col("e"), F.col("ce")) / (F.col("nrm") * F.col("cnrm")), 6)
    scored = v.crossJoin(F.broadcast(cent)).withColumn("cos", cos)
    rk = F.row_number().over(
        W.partitionBy("vec_id").orderBy(F.desc("cos"), F.asc("clabel"))
    )
    return (
        scored.withColumn("rk", rk)
        .filter(F.col("rk") == 1)
        .groupBy("label", F.col("clabel").alias("pred_label"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


# ---------------------------------------------------------------------------
# sm08 — train/val/test split: the canonical 80/10/10 disjoint carve by
# deterministic content hash (md5 of doc_id || salt, both engines) —
# reproducible across runs/engines, partition-independent, and leak-
# free by construction (a doc's split is a pure function of its id).
# One map-side-combined aggregate proves sizes and totals per split.
# ---------------------------------------------------------------------------
@query(
    "sm08_train_val_test_split",
    bench=True,
    oracle="""
    WITH assigned AS (
      SELECT n_chars,
             CASE
               WHEN h < 0.8 THEN 'train'
               WHEN h < 0.9 THEN 'val'
               ELSE 'test'
             END AS split
      FROM (
        SELECT n_chars,
               (('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|split'), 1, 15))::BIGINT)
                 / CAST(1152921504606846976 AS DOUBLE) AS h
        FROM documents
      )
    )
    SELECT split, COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM assigned GROUP BY split
    """,
)
def sm08_train_val_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _documents(spark, sf_dir)
    h = (
        F.conv(F.substring(F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("|split"))), 1, 15), 16, 10)
        .cast("bigint")
        / F.lit(float(1 << 60))
    )
    assigned = d.select(
        "n_chars",
        F.when(h < 0.8, "train").when(h < 0.9, "val").otherwise("test").alias("split"),
    )
    return assigned.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
    )


# ---------------------------------------------------------------------------
# sm09 — LEAK-FREE train/val/test split: the naive per-doc split (sm08)
# leaks when near-duplicate documents land in different splits — the
# benchmark-contamination failure mode inside one's own corpus.  Here
# the split is a hash of the near-dup CLUSTER id (dd07's components;
# docs with no near-dup are their own cluster), so every cluster lands
# in exactly one split by construction.  Output proves it: per split,
# doc and cluster counts (sum of n_clusters == total distinct
# clusters — no cluster is double-counted across splits).
# ---------------------------------------------------------------------------
@query(
    "sm09_cluster_safe_split",
    oracle=f"""
    WITH RECURSIVE sig AS ({_DUCK_MINHASH_SIG}),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM sig a JOIN sig b
        ON a.i = b.i AND a.minh = b.minh AND a.doc_id < b.doc_id
      GROUP BY 1, 2
      HAVING COUNT(*) >= 4
    ),
    sym AS (
      SELECT doc_a AS u, doc_b AS v FROM pairs
      UNION
      SELECT doc_b, doc_a FROM pairs
    ),
    reach(u, v) AS (
      SELECT u, v FROM sym
      UNION
      SELECT r.u, s.v FROM reach r JOIN sym s ON r.v = s.u WHERE s.v <> r.u
    ),
    comp AS (
      SELECT u AS doc_id, LEAST(u, MIN(v)) AS component
      FROM reach GROUP BY u
    ),
    assigned AS (
      SELECT d.doc_id,
             COALESCE(c.component, d.doc_id) AS cluster_id,
             CASE
               WHEN (('0x' || substr(md5(CAST(COALESCE(c.component, d.doc_id) AS VARCHAR)
                                         || '|csplit'), 1, 15))::BIGINT)
                    / CAST(1152921504606846976 AS DOUBLE) < 0.8 THEN 'train'
               WHEN (('0x' || substr(md5(CAST(COALESCE(c.component, d.doc_id) AS VARCHAR)
                                         || '|csplit'), 1, 15))::BIGINT)
                    / CAST(1152921504606846976 AS DOUBLE) < 0.9 THEN 'val'
               ELSE 'test'
             END AS split
      FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id
    )
    SELECT split, COUNT(*) AS n_docs,
           COUNT(DISTINCT cluster_id) AS n_clusters
    FROM assigned GROUP BY split
    """,
)
def sm09_cluster_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _documents(spark, sf_dir)
    sig = dedup.minhash_signatures(dedup.shingle_sets(docs), num_hashes=8)
    edges = (
        dedup.minhash_candidate_pairs(sig, num_hashes=8)
        .filter(F.col("n_hash_agree") >= 4)
        .select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    )
    comp = dedup.connected_components(edges).select(
        F.col("node").alias("doc_id"), "component"
    )
    cluster = F.coalesce(F.col("component"), F.col("doc_id"))
    h = (
        F.conv(
            F.substring(
                F.md5(F.concat(cluster.cast("string"), F.lit("|csplit"))), 1, 15
            ),
            16,
            10,
        ).cast("bigint")
        / F.lit(float(1 << 60))
    )
    assigned = docs.select("doc_id").join(comp, "doc_id", "left").select(
        cluster.alias("cluster_id"),
        F.when(h < 0.8, "train").when(h < 0.9, "val").otherwise("test").alias("split"),
    )
    return assigned.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("cluster_id").alias("n_clusters"),
    )


@query(
    "sm11_shuffle_order",
    doc="reproducible global training shuffle: rank in the md5(salt|id) "
    "permutation via range-sliced parallel ranking "
    "(llmops.sampling.shuffle_order over operators.ranks)",
    oracle=f"""
    SELECT doc_id, source,
           CAST(ROW_NUMBER() OVER (
             ORDER BY {_DUCK_H60.format(expr="'shuf|' || CAST(doc_id AS VARCHAR)")},
                      doc_id
           ) AS BIGINT) AS shuffle_rank
    FROM documents
    """,
)
def sm11_shuffle_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _documents(spark, sf_dir).select("doc_id", "source")
    return sampling.shuffle_order(docs, key_col="doc_id")


@query(
    "sm10_calibrated_quality",
    doc="per-source quantile-normalized quality: one global cut takes the "
    "same top fraction of every source (llmops.sampling.quantile_calibrate)",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id, source,
             ROUND(0.4 * LEAST(1.0, len(toks) / 100.0)
                   + 0.3 * (len(list_distinct(toks))
                            / CAST(NULLIF(len(toks), 0) AS DOUBLE))
                   + 0.3 * (length(regexp_replace(lower(text), '[^a-z]', '', 'g'))
                            / CAST(NULLIF(length(text), 0) AS DOUBLE)) + 1e-9,
                   4) AS quality
      -- distinct document grain: duplicate ingests would both shift
      -- every PERCENT_RANK and double-count in the calibrated output
      FROM (SELECT doc_id, source, text, {_DUCK_TOKENS} AS toks
            FROM (SELECT DISTINCT doc_id, source, text FROM documents))
    ),
    cal AS (
      -- ranks over KNOWN qualities only, matching quantile_calibrate:
      -- including NULLs would both brand them "worst" and shift every
      -- real row's rank
      SELECT doc_id, source, quality,
             ROUND(PERCENT_RANK() OVER (PARTITION BY source ORDER BY quality), 6)
               AS calibrated
      FROM scored WHERE quality IS NOT NULL
    )
    SELECT doc_id, source, quality, calibrated, (calibrated >= 0.8) AS kept
    FROM cal
    UNION ALL
    SELECT doc_id, source, quality, NULL AS calibrated, NULL AS kept
    FROM scored WHERE quality IS NULL
    """,
)
def sm10_calibrated_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    # distinct document grain (see oracle note); localCheckpoint = one
    # corpus pass for both consumers (see pipe03)
    docs = (
        _documents(spark, sf_dir)
        .select("doc_id", "source", "text")
        .distinct()
        .localCheckpoint(eager=False)
    )
    scored = docs.select("doc_id", "source").join(text.quality_score(docs), "doc_id")
    cal = sampling.quantile_calibrate(
        scored, score_col="quality", group_col="source"
    )
    return cal.select(
        "doc_id", "source", "quality", "calibrated",
        (F.col("calibrated") >= 0.8).alias("kept"),
    )


# ---------------------------------------------------------------------------
# pipe02 — RAG corpus preparation as ONE composed DAG: exact-dedup the
# documents (keeper = min doc_id per content hash), chunk the keepers
# into 32/24 token windows, fingerprint each chunk, and account per
# source: kept docs, chunks, tokens, distinct chunk fingerprints (the
# residual post-chunk duplication the next dedup round would remove).
# The whole pipeline is dedup-shuffle + narrow chunk expansion +
# one aggregate; the oracle chains the same stages as SQL CTEs.
# ---------------------------------------------------------------------------
@query(
    "pipe02_rag_corpus",
    bench=True,
    doc="dedup -> chunk -> fingerprint -> per-source accounting",
    oracle=f"""
    WITH keepers AS (
      SELECT MIN(doc_id) AS doc_id
      FROM documents GROUP BY md5(text)
    ),
    kept AS (
      SELECT d.doc_id, d.source, {_DUCK_TOKENS} AS toks
      FROM documents d JOIN keepers k ON d.doc_id = k.doc_id
    ),
    chunks AS (
      SELECT doc_id, source,
             CAST(LEAST(32, len(toks) - start) AS INT) AS n_tokens,
             md5(array_to_string(list_slice(toks, start + 1, start + 32), ' '))
               AS fp
      FROM (
        SELECT doc_id, source, toks,
               UNNEST(generate_series(0, len(toks) - 1, 24)) AS start
        FROM kept WHERE len(toks) > 0
      )
      WHERE start = 0 OR start - 24 + 32 < len(toks)
    )
    SELECT source,
           COUNT(DISTINCT doc_id) AS n_docs,
           COUNT(*) AS n_chunks,
           CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
           COUNT(DISTINCT fp) AS n_uniq_chunks
    FROM chunks GROUP BY source
    """,
)
def pipe02_rag_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _documents(spark, sf_dir)
    keepers = docs.groupBy(F.md5("text")).agg(F.min("doc_id").alias("doc_id"))
    kept = docs.join(keepers.select("doc_id"), "doc_id")
    chunks = text.chunk_tokens(kept, size=32, stride=24, keep_cols=("source",))
    return (
        chunks.select("doc_id", "source", "n_tokens", F.md5("chunk_text").alias("fp"))
        .groupBy("source")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum("n_tokens").cast("bigint").alias("n_tokens"),
            F.countDistinct("fp").alias("n_uniq_chunks"),
        )
    )


# ---------------------------------------------------------------------------
# dd10 — winnowing-based near-dup candidates (the MOSS / plagiarism
# detector modality): documents sharing >= 3 winnowed fingerprints
# (tx05's k=3 w=4 selection).  Winnowing guarantees any shared run of
# >= w+k-1 tokens yields a shared fingerprint, so this catches
# LOCALIZED copying that whole-document MinHash (dd04) dilutes away —
# the complementary recall profile.  Same scale shape as dd04: join on
# the fingerprint, count per pair; hot fingerprints are bounded by the
# winnowing window density ~2/(w+1).
# ---------------------------------------------------------------------------
@query(
    "dd10_winnow_pairs",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, {_DUCK_TOKENS} AS toks FROM documents
    ),
    h AS (
      SELECT doc_id,
             list_transform(generate_series(1, len(toks) - 2),
                            i -> {_DUCK_H60.format(expr="toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]")}) AS hs
      FROM t WHERE len(toks) >= 3
    ),
    fp AS (
      SELECT doc_id, UNNEST(fps) AS fingerprint
      FROM (
        SELECT doc_id,
               CASE WHEN len(hs) >= 4
                    THEN list_distinct(list_transform(generate_series(1, len(hs) - 3),
                                                      i -> list_min(hs[i:i+3])))
                    ELSE [list_min(hs)] END AS fps
        FROM h
      )
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           COUNT(*) AS n_shared
    FROM fp a JOIN fp b
      ON a.fingerprint = b.fingerprint AND a.doc_id < b.doc_id
    GROUP BY 1, 2
    HAVING COUNT(*) >= 3
    """,
)
def dd10_winnow_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    fp = text.winnow_fingerprints(_documents(spark, sf_dir), k=3, w=4)
    a = fp.select(F.col("doc_id").alias("doc_a"), "fingerprint")
    b = fp.select(F.col("doc_id").alias("doc_b"), "fingerprint")
    return (
        a.join(b, "fingerprint")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= 3)
    )


# ---------------------------------------------------------------------------
# dd11 — exact-substring (hot-span) dedup, Lee et al. 2022: every run
# of 5 consecutive tokens occurring 2+ times corpus-wide is flagged;
# overlapping flagged 5-grams merge into maximal spans (classic
# running-max interval merge inside a per-document window).  Two linear
# shuffles — by gram for the corpus count, by document for the merge —
# never a pairwise comparison; the conservative scrub-all-copies
# variant (compose with dd01 to keep a canonical copy).
# ---------------------------------------------------------------------------
@query(
    "dd11_hot_span_scrub",
    bench=True,
    doc="exact-substring dedup summary: merged hot-5-gram spans per doc "
    "(llmops.dedup.hot_span_scrub)",
    oracle=f"""
    WITH toks AS (SELECT doc_id, {_DUCK_TOKENS} AS toks FROM documents),
    sh AS (
      SELECT doc_id, UNNEST(generate_series(1, len(toks) - 4)) AS i, toks
      FROM toks
    ),
    g AS (SELECT doc_id, i - 1 AS pos, toks[i+0] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3] || ' ' || toks[i+4] AS gram FROM sh),
    hot AS (SELECT gram FROM g GROUP BY gram HAVING COUNT(*) >= 2),
    fl AS (SELECT doc_id, pos FROM g JOIN hot USING (gram)),
    m AS (
      SELECT doc_id, pos,
             MAX(pos + 5) OVER (PARTITION BY doc_id ORDER BY pos
                                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS prev_end
      FROM fl
    ),
    sp AS (
      SELECT doc_id, pos,
             SUM(CASE WHEN prev_end IS NULL OR pos > prev_end THEN 1 ELSE 0 END)
               OVER (PARTITION BY doc_id ORDER BY pos
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS span_id
      FROM m
    ),
    spans AS (
      SELECT doc_id, span_id, MIN(pos) AS s, MAX(pos) + 5 AS e
      FROM sp GROUP BY doc_id, span_id
    ),
    summ AS (
      SELECT doc_id, COUNT(*) AS n_spans, SUM(e - s) AS n_scrubbed
      FROM spans GROUP BY doc_id
    )
    SELECT t.doc_id,
           CAST(len(t.toks) AS INT) AS n_tokens,
           CAST(COALESCE(s.n_spans, 0) AS BIGINT) AS n_spans,
           CAST(COALESCE(s.n_scrubbed, 0) AS BIGINT) AS n_scrubbed,
           ROUND(1.0 - COALESCE(s.n_scrubbed, 0)
                 / GREATEST(len(t.toks), 1), 4) AS keep_ratio
    FROM toks t LEFT JOIN summ s USING (doc_id)
    """,
)
def dd11_hot_span_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.hot_span_scrub(_documents(spark, sf_dir), n=5, min_count=2)


# ---------------------------------------------------------------------------
# pipe03 — per-source curation report composing the round-2 operators
# in ONE Catalyst plan: tx04's quality gate, dd11's hot-span scrub
# ratios, and et24's histogram-quantile sketch over token counts, all
# rolled up per source.  Like pipe01/pipe02, the point is pinning that
# the FUSED composition still matches the stage-by-stage oracle — the
# documents scan is shared, the per-doc intermediates never
# materialize.  Rounded per-source averages carry the same +1e-9
# half-boundary nudge tx04 documents.
# ---------------------------------------------------------------------------
@query(
    "pipe03_curation_report",
    bench=True,
    doc="per-source curation report: quality pass-rate + scrub keep-ratio "
    "+ token-count p50/p90 (quality_score ∘ hot_span_scrub ∘ hist sketch)",
    oracle=f"""
    WITH toks AS (
      -- distinct document grain: duplicate ingests would instantly make
      -- every gram of a duplicated doc "hot" (COUNT >= 2), fan out the
      -- doc_id joins, and double-count the per-source report
      SELECT doc_id, source, text, {{tok}} AS toks
      FROM (SELECT DISTINCT doc_id, source, text FROM documents)
    ),
    quality AS (
      SELECT doc_id, source,
             ROUND(0.4 * LEAST(1.0, len(toks) / 100.0)
                   + 0.3 * (len(list_distinct(toks))
                            / CAST(NULLIF(len(toks), 0) AS DOUBLE))
                   + 0.3 * (length(regexp_replace(lower(text), '[^a-z]', '', 'g'))
                            / CAST(NULLIF(length(text), 0) AS DOUBLE)) + 1e-9,
                   4) AS quality
      FROM toks
    ),
    sh AS (
      SELECT doc_id, UNNEST(generate_series(1, len(toks) - 4)) AS i, toks
      FROM toks
    ),
    g AS (SELECT doc_id, i - 1 AS pos,
                 {" || ' ' || ".join(f"toks[i+{j}]" for j in range(5))} AS gram
          FROM sh),
    hot AS (SELECT gram FROM g GROUP BY gram HAVING COUNT(*) >= 2),
    fl AS (SELECT doc_id, pos FROM g JOIN hot USING (gram)),
    m AS (
      SELECT doc_id, pos,
             MAX(pos + 5) OVER (PARTITION BY doc_id ORDER BY pos
                                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS prev_end
      FROM fl
    ),
    sp AS (
      SELECT doc_id, pos,
             SUM(CASE WHEN prev_end IS NULL OR pos > prev_end THEN 1 ELSE 0 END)
               OVER (PARTITION BY doc_id ORDER BY pos
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS span_id
      FROM m
    ),
    spans AS (SELECT doc_id, span_id, MIN(pos) AS s, MAX(pos) + 5 AS e
              FROM sp GROUP BY 1, 2),
    summ AS (SELECT doc_id, SUM(e - s) AS n_scrubbed FROM spans GROUP BY 1),
    perdoc AS (
      SELECT t.doc_id, t.source, CAST(len(t.toks) AS INT) AS n_tokens,
             ROUND(1.0 - COALESCE(s.n_scrubbed, 0)
                   / GREATEST(len(t.toks), 1), 4) AS keep_ratio
      FROM toks t LEFT JOIN summ s USING (doc_id)
    ),
    bins AS (
      -- hist_partials drops NULL values: a NULL-text doc has no token
      -- count and sits outside the quantile estimate (and its cnt must
      -- not inflate the cumulative total)
      SELECT source, CAST(FLOOR(n_tokens / 16.0) AS BIGINT) AS bin,
             COUNT(*) AS cnt
      FROM perdoc WHERE n_tokens IS NOT NULL GROUP BY 1, 2
    ),
    cum AS (
      SELECT source, bin, cnt,
             SUM(cnt) OVER (PARTITION BY source ORDER BY bin) AS cum,
             SUM(cnt) OVER (PARTITION BY source) AS total
      FROM bins
    ),
    qs AS (SELECT UNNEST(CAST([0.5, 0.9] AS DOUBLE[])) AS q),
    pick AS (
      SELECT source, q, bin, cnt, cum - cnt AS cum_before, q * total AS target,
             ROW_NUMBER() OVER (PARTITION BY source, q ORDER BY bin) AS rn
      FROM cum CROSS JOIN qs
      WHERE cum >= q * total
    ),
    tokq AS (
      SELECT source,
             MAX(CASE WHEN q = 0.5 THEN
               ROUND(bin * 16.0 + 16.0 * (target - cum_before) / cnt, 4) END)
               AS p50_tokens,
             MAX(CASE WHEN q = 0.9 THEN
               ROUND(bin * 16.0 + 16.0 * (target - cum_before) / cnt, 4) END)
               AS p90_tokens
      FROM pick WHERE rn = 1 GROUP BY source
    ),
    agg AS (
      SELECT p.source,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             ROUND(AVG(CASE WHEN q.quality >= 0.5 THEN 1.0 ELSE 0.0 END) + 1e-9, 4)
               AS quality_pass_rate,
             ROUND(AVG(p.keep_ratio) + 1e-9, 4) AS mean_keep_ratio
      FROM perdoc p JOIN quality q USING (doc_id)
      GROUP BY 1
    )
    SELECT a.source, a.n_docs, a.quality_pass_rate, a.mean_keep_ratio,
           t.p50_tokens, t.p90_tokens
    FROM agg a JOIN tokq t USING (source)
    """.format(tok=_DUCK_TOKENS),
)
def pipe03_curation_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_batch_spark.llmops.text import quality_column
    from etl_batch_spark.operators.sketch import hist_quantiles

    # distinct document grain (see oracle note).  localCheckpoint
    # materializes the deduped corpus ONCE — *with the token array and
    # quality score already computed in the same projection*: before
    # round 10 the quality branch, the scrub branch and the n_tokens
    # base each re-tokenized the corpus from the checkpoint (4-5
    # tokenize passes per run), and the per-source aggregate and the
    # histogram branch each replayed the whole scrub lineage (22
    # Exchanges in the executed plan).  One corpus pass, one token
    # array, one quality projection (optimization guide §2.3: project
    # before the exchange; §2.4: share one exchange between consumers).
    base = (
        _documents(spark, sf_dir)
        .select("doc_id", "source", "text")
        .distinct()
        .withColumn("toks", dedup.tokens("text"))
        .select(
            "doc_id",
            "source",
            "toks",
            F.size("toks").alias("n_tokens"),
            quality_column("text", "toks").alias("quality"),
        )
        .localCheckpoint(eager=False)
    )
    scrub = dedup.hot_span_scrub(base, n=5, min_count=2, toks_col="toks")
    perdoc = scrub.join(
        base.select("doc_id", "source", "quality"), "doc_id"
    )

    # ONE shuffle feeds both report halves: group to (source, bin)
    # partials carrying the quality/keep-ratio partial sums alongside
    # the histogram count (two-level aggregation, guide §2.3) — the
    # per-source report is then a rollup of the partials and the
    # quantile estimate reads the same rows.  `bins` is bin-count-sized
    # (never row-count-sized), so its checkpoint is a metadata-cheap way
    # to keep the two consumers from replaying the scrub lineage twice.
    # NULL n_tokens (NULL text) lands in bin NULL: part of every
    # per-source average, excluded from the histogram exactly as
    # hist_partials' NULL-value rule did.
    bins = (
        perdoc.groupBy(
            "source",
            F.floor(F.col("n_tokens").cast("double") / F.lit(16.0))
            .cast("bigint")
            .alias("bin"),
        )
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(
                F.when(F.col("quality") >= 0.5, 1.0).otherwise(0.0)
            ).alias("q_pass"),
            F.sum("keep_ratio").alias("keep_sum"),
        )
        .localCheckpoint(eager=False)
    )
    tokq = (
        hist_quantiles(
            bins.filter(F.col("bin").isNotNull()).select(
                F.col("source").alias("bucket"), "bin", "cnt"
            ),
            width=16.0,
            qs=(0.5, 0.9),
        )
        .groupBy("bucket")
        .agg(
            F.max(F.when(F.col("q") == 0.5, F.col("est"))).alias("p50_tokens"),
            F.max(F.when(F.col("q") == 0.9, F.col("est"))).alias("p90_tokens"),
        )
        .withColumnRenamed("bucket", "source")
    )
    agg = bins.groupBy("source").agg(
        F.sum("cnt").cast("bigint").alias("n_docs"),
        F.round(F.sum("q_pass") / F.sum("cnt") + F.lit(1e-9), 4).alias(
            "quality_pass_rate"
        ),
        F.round(F.sum("keep_sum") / F.sum("cnt") + F.lit(1e-9), 4).alias(
            "mean_keep_ratio"
        ),
    )
    return agg.join(tokq, "source")


# ---------------------------------------------------------------------------
# pipe04 — pretraining-mix assembly as ONE composed DAG: calibrate
# quality per source (sm10) → keep the top half of EVERY source →
# temperature-rebalance languages at alpha=0.5 (sm03) → pack survivors
# into whole-doc 256-token bins (tx18) → per-shard packing report.
# Every stage is individually oracle-checked elsewhere; this pins the
# COMPOSITION (the thing a real curation run executes) with a single
# chained oracle — recursive CTE included.
# ---------------------------------------------------------------------------
@query(
    "pipe04_pretraining_mix",
    doc="calibrated quality gate -> temperature language mix -> next-fit "
    "packing, reported per shard (quantile_calibrate ∘ "
    "temperature_mixture_sample ∘ pack_nextfit)",
    bench=True,
    oracle=f"""
    WITH RECURSIVE scored AS (
      SELECT doc_id, source, lang, text,
             ROUND(0.4 * LEAST(1.0, len(toks) / 100.0)
                   + 0.3 * (len(list_distinct(toks))
                            / CAST(NULLIF(len(toks), 0) AS DOUBLE))
                   + 0.3 * (length(regexp_replace(lower(text), '[^a-z]', '', 'g'))
                            / CAST(NULLIF(length(text), 0) AS DOUBLE)) + 1e-9,
                   4) AS quality
      -- distinct document grain: duplicate ingests shift every
      -- PERCENT_RANK, double-sample strata and double-pack bins
      FROM (SELECT doc_id, source, lang, text, {_DUCK_TOKENS} AS toks
            FROM (SELECT DISTINCT doc_id, source, lang, text FROM documents))
    ),
    kept AS (
      -- ranks over KNOWN qualities only (quantile_calibrate semantics);
      -- NULL-quality docs fail the gate on both engines
      SELECT doc_id, lang, text FROM (
        SELECT doc_id, lang, text,
               ROUND(PERCENT_RANK() OVER (PARTITION BY source ORDER BY quality),
                     6) AS calibrated
        FROM scored WHERE quality IS NOT NULL
      ) WHERE calibrated >= 0.5
    ),
    sizes AS (SELECT lang, COUNT(*) AS n_s FROM kept GROUP BY 1),
    tot AS (
      SELECT CAST(SUM(n_s) AS DOUBLE) AS n_total,
             SUM(sqrt(CAST(n_s AS DOUBLE))) AS w_total
      FROM sizes
    ),
    rates AS (
      SELECT lang,
             CAST(FLOOR(LEAST(1.0,
               0.5 * n_total * (sqrt(CAST(n_s AS DOUBLE)) / w_total)
               / CAST(n_s AS DOUBLE)) * 1000000) AS BIGINT) AS threshold
      FROM sizes, tot
    ),
    sampled AS (
      -- null-safe stratum join, matching temperature_mixture_sample
      SELECT k.doc_id, k.text
      FROM kept k JOIN rates r ON k.lang IS NOT DISTINCT FROM r.lang
      WHERE {_DUCK_BUCKET_OF.format(salt="s0", key="k.doc_id")} < r.threshold
    ),
    base AS (
      SELECT doc_id,
             CAST(len({_DUCK_TOKENS}) AS BIGINT) AS n_tok,
             CAST((('0x' || substr(md5('pack|' || CAST(doc_id AS VARCHAR)), 1, 15))
                   ::BIGINT % 4) AS INT) AS shard
      FROM sampled
    ),
    ordered AS (
      SELECT doc_id, n_tok, shard,
             ROW_NUMBER() OVER (PARTITION BY shard ORDER BY n_tok DESC, doc_id)
               AS rn
      FROM base
    ),
    rec AS (
      SELECT doc_id, shard, n_tok, rn, 1 AS bin, n_tok AS fill_after
      FROM ordered WHERE rn = 1
      UNION ALL
      SELECT o.doc_id, o.shard, o.n_tok, o.rn,
             CASE WHEN r.fill_after + o.n_tok > 256 THEN r.bin + 1
                  ELSE r.bin END,
             CASE WHEN r.fill_after + o.n_tok > 256 THEN o.n_tok
                  ELSE r.fill_after + o.n_tok END
      FROM rec r JOIN ordered o ON o.shard = r.shard AND o.rn = r.rn + 1
    )
    SELECT shard,
           COUNT(*) AS n_docs,
           CAST(MAX(bin) AS INT) AS n_bins,
           CAST(SUM(n_tok) AS BIGINT) AS packed_tokens,
           ROUND(CAST(SUM(n_tok) AS DOUBLE) / MAX(bin), 4) AS mean_bin_fill
    FROM rec GROUP BY shard
    """,
)
def pipe04_pretraining_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    # distinct document grain (see oracle note); localCheckpoint = one
    # corpus pass for the multi-consumer composition (see pipe03).
    # Round 10: the checkpoint now carries ONLY the scalars every later
    # stage needs (n_tokens, quality) — text is tokenized and scored
    # exactly once in the projection that materializes it.  Before,
    # quality_score re-tokenized from the checkpoint and joined back on
    # doc_id, and pack_nextfit tokenized a THIRD time at the end of the
    # chain (guide §2.3: project before the exchange — here the
    # projection also shrinks the checkpoint itself from full text to
    # four scalar columns).
    docs = (
        _documents(spark, sf_dir)
        .select("doc_id", "source", "lang", "text")
        .distinct()
        .withColumn("toks", dedup.tokens("text"))
        .select(
            "doc_id",
            "source",
            "lang",
            F.size("toks").alias("n_tokens"),
            text.quality_column("text", "toks").alias("quality"),
        )
        .localCheckpoint(eager=False)
    )
    cal = sampling.quantile_calibrate(
        docs, score_col="quality", group_col="source"
    )
    # Round 11: materialize the survivors of the calibrated gate ONCE.
    # temperature_mixture_sample consumes its input three times (the
    # per-stratum sizes, the totals, and the join-back), and each
    # consumer replayed the whole per-source PERCENT_RANK window —
    # three corpus-wide window executions per run (10 Exchanges in the
    # r10 plan).  `kept` is three scalar columns, far narrower than the
    # corpus, so checkpointing it trades one cheap materialization for
    # two full window re-computations (guide §2.4: share one exchange
    # between consumers; §5: localCheckpoint as the cheap lineage cut).
    kept = (
        cal.filter(F.col("calibrated") >= 0.5)
        .select("doc_id", "lang", "n_tokens")
        .localCheckpoint(eager=False)
    )
    sampled = sampling.temperature_mixture_sample(
        kept, key_col="doc_id", strata_col="lang", alpha=0.5, total_fraction=0.5
    )
    packed = text.pack_nextfit(
        sampled, capacity=256, n_shards=4, n_tok_col="n_tokens"
    )
    return packed.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.max("bin").alias("n_bins"),
        F.sum("n_tok").alias("packed_tokens"),
        F.round(
            F.sum("n_tok").cast("double") / F.max("bin"), 4
        ).alias("mean_bin_fill"),
    )


# ---------------------------------------------------------------------------
# mm04 — perceptual-hash near-dup pairs across modalities: dHash over
# the decoded feature vector (bit i set when feature[i+1] > feature[i],
# the classic difference-hash shape), candidates from an equi-join on
# the hash bucket — the multimodal twin of dd05's SimHash, composing
# mapInPandas decode with dedup-style bucketing.  With the container's
# deterministic fake codec the whole pipeline is exactly oracle-checked;
# a real codec swaps _fake_decode only, the bucketing plan is identical.
# Exact-duplicate payloads (same md5) necessarily share the phash, so
# recall for true copies is 1.0 at any scale.  Scale parameterization:
# pair count is Σ C(bucket, 2) ≈ n²/2^(bits+1) — 7 bits is what the
# fixture's 8-dim fake feature yields and is fine to ~10⁴ docs; a real
# codec emits ≥64-dim features ⇒ a 63-bit dHash, the same plan with
# bucket sizes ~n/2^63 (dd05's SimHash plays the same card at 16 bits).
# ---------------------------------------------------------------------------
@query(
    "mm04_phash_neardup",
    bench=True,
    doc="difference-hash (dHash) near-dup pairs over decoded features "
    "(multimodal.decode_image ∘ phash bucket join)",
    oracle="""
    WITH feat AS (
      SELECT doc_id,
             list_transform(generate_series(1, 8),
               i -> ROUND((('0x' || substr(md5(text), 3 + 2 * i, 2))::BIGINT)
                          / 255.0, 6)) AS f
      -- attach_payload drops NULL-text rows; without this a NULL text
      -- would fold to phash 0 here and fabricate an all-NULL dup bucket
      FROM documents WHERE text IS NOT NULL
    ),
    ph AS (
      SELECT doc_id,
             CAST((CASE WHEN f[2] > f[1] THEN 1 ELSE 0 END)
                + (CASE WHEN f[3] > f[2] THEN 2 ELSE 0 END)
                + (CASE WHEN f[4] > f[3] THEN 4 ELSE 0 END)
                + (CASE WHEN f[5] > f[4] THEN 8 ELSE 0 END)
                + (CASE WHEN f[6] > f[5] THEN 16 ELSE 0 END)
                + (CASE WHEN f[7] > f[6] THEN 32 ELSE 0 END)
                + (CASE WHEN f[8] > f[7] THEN 64 ELSE 0 END) AS INT) AS phash
      FROM feat
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.phash
    FROM ph a JOIN ph b ON a.phash = b.phash AND a.doc_id < b.doc_id
    """,
)
def mm04_phash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = multimodal.attach_payload(_documents(spark, sf_dir))
    decoded = multimodal.decode_image(docs, fake=True)
    bits = " + ".join(
        f"(case when feature[{i + 1}] > feature[{i}] then {1 << i} else 0 end)"
        for i in range(7)
    )
    ph = decoded.select("doc_id", F.expr(f"cast({bits} as int)").alias("phash"))
    a = ph.select(F.col("doc_id").alias("doc_a"), "phash")
    b = ph.select(F.col("doc_id").alias("doc_b"), "phash")
    return (
        a.join(b, "phash")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "phash")
    )


# ---------------------------------------------------------------------------
# mm05 — ViT patch-grid plan (multimodal ∘ resize composition): decoded
# dims → 224-capped resize → 16px patch grid with padding.  The patch
# count is the image's transformer sequence length — the number the
# training-mix accounting bills multimodal rows by.  All integer
# column arithmetic after the Arrow-batched decode; the oracle replays
# the md5-derived dims end-to-end.
# ---------------------------------------------------------------------------
@query(
    "mm05_patch_grid",
    doc="ViT patch-grid plan: decode → resize → 16px grid + padding "
    "(llmops.multimodal.patch_grid_plan)",
    oracle="""
    WITH decoded AS (
      SELECT doc_id,
             CAST(64 + (('0x' || substr(md5(text), 1, 2))::BIGINT % 192) AS INT) AS width,
             CAST(64 + (('0x' || substr(md5(text), 3, 2))::BIGINT % 192) AS INT) AS height
      -- attach_payload drops NULL-text rows (no payload to fabricate)
      FROM documents WHERE text IS NOT NULL
    ),
    sized AS (
      SELECT doc_id,
             CAST(least(224, ceil(width * round(least(1.0, 224.0 / greatest(width, height)), 6))) AS INT)
               AS target_width,
             CAST(least(224, ceil(height * round(least(1.0, 224.0 / greatest(width, height)), 6))) AS INT)
               AS target_height
      FROM decoded
    )
    SELECT doc_id, target_width, target_height,
           CAST(ceil(target_width / 16.0) AS INT) AS n_patches_x,
           CAST(ceil(target_height / 16.0) AS INT) AS n_patches_y,
           CAST(ceil(target_width / 16.0) * ceil(target_height / 16.0) AS BIGINT)
             AS n_patches,
           CAST(ceil(target_width / 16.0) * 16 - target_width AS INT) AS pad_right,
           CAST(ceil(target_height / 16.0) * 16 - target_height AS INT) AS pad_bottom
    FROM sized
    """,
)
def mm05_patch_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = multimodal.attach_payload(_documents(spark, sf_dir))
    decoded = multimodal.decode_image(docs, fake=True)
    sized = multimodal.resize_plan(decoded)
    return multimodal.patch_grid_plan(sized).select(
        "doc_id",
        "target_width",
        "target_height",
        "n_patches_x",
        "n_patches_y",
        "n_patches",
        "pad_right",
        "pad_bottom",
    )


# ---------------------------------------------------------------------------
# mm06 — decoded-audio stats: the audio twin of mm01.  decode_audio's
# Arrow-batched narrow map runs the deterministic md5 codec stub over
# the payload bytes, so sample rate / channel count / frame count /
# duration and the first feature amplitude are all exactly
# oracle-checkable per document (a real corpus swaps _fake_decode_audio
# for the WAV codec; the plan is identical).  hex pairs: digest byte i
# is substr(md5, 2i+1, 2); feature[0] is digest[5] → substr 11.
# ---------------------------------------------------------------------------
@query(
    "mm06_decode_audio_stats",
    doc="binary payload → mapInPandas fake audio decode → per-doc rate/"
    "channels/frames/duration stats (llmops.multimodal.decode_audio)",
    oracle="""
    SELECT doc_id,
           CAST(8000 + 100 * (('0x' || substr(md5(text), 1, 2))::BIGINT % 160)
                AS INT) AS sample_rate,
           CAST(1 + (('0x' || substr(md5(text), 3, 2))::BIGINT % 2)
                AS INT) AS channels,
           CAST(1 + (('0x' || substr(md5(text), 5, 6))::BIGINT % 100000)
                AS BIGINT) AS n_frames,
           (1 + (('0x' || substr(md5(text), 5, 6))::BIGINT % 100000))
             / CAST(8000 + 100 * (('0x' || substr(md5(text), 1, 2))::BIGINT % 160)
                    AS DOUBLE) AS duration_s,
           ROUND((('0x' || substr(md5(text), 11, 2))::BIGINT) / 255.0, 6) AS amp0
    -- attach_payload drops NULL-text rows (no payload to fabricate)
    FROM documents WHERE text IS NOT NULL
    """,
)
def mm06_decode_audio_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = multimodal.attach_payload(_documents(spark, sf_dir))
    decoded = multimodal.decode_audio(docs, fake=True)
    return decoded.select(
        "doc_id",
        "sample_rate",
        "channels",
        "n_frames",
        "duration_s",
        # feature is float32; 6dp decimals round-trip float32→double
        # exactly under a re-round (float32 carries ~7.2 decimal digits)
        F.round(F.col("feature")[0].cast("double"), 6).alias("amp0"),
    )


# Deterministic container signatures for the triage/curation fixtures:
# each doc gets a real magic prefix chosen by doc_id % 6, so the
# header-only probe (llmops.mediainfo) classifies a known mix and the
# oracle replays the routing as a CASE over the same residue.  Built
# with % (not pmod) so negative/NULL ids take the same branch in Spark
# and DuckDB (no match → 'ZZZZ' → container 'unknown').
_MEDIA_PREFIXES = [
    (0, "RIFF1234WAVE", "wav", "audio"),
    (1, "RIFF1234AVI ", "avi", "video"),
    (2, "GIF89a", "gif", "image"),
    (3, "P2", "pnm", "image"),
    (4, "ID3", "mp3", "audio"),
]

_DUCK_MEDIA_PREFIX = (
    "CASE doc_id % 6 WHEN 0 THEN 'RIFF1234WAVE' WHEN 1 THEN 'RIFF1234AVI '"
    " WHEN 2 THEN 'GIF89a' WHEN 3 THEN 'P2' WHEN 4 THEN 'ID3'"
    " ELSE 'ZZZZ' END"
)


def _media_prefixed_payload(docs: DataFrame) -> DataFrame:
    prefix = F.lit("ZZZZ")
    for residue, sig, _c, _m in reversed(_MEDIA_PREFIXES):
        prefix = F.when(F.col("doc_id") % 6 == residue, F.lit(sig)).otherwise(prefix)
    return docs.filter(F.col("text").isNotNull()).withColumn(
        "payload", F.encode(F.concat(prefix, F.col("text")), "UTF-8")
    )


# ---------------------------------------------------------------------------
# mm07 — header-only media triage (llmops.mediainfo.probe_media_df):
# container/modality census of a mixed-signature corpus from HEADER
# BYTES ALONE — the scan stage in front of every decode pipeline at
# crawl scale (route / budget / quarantine before paying for a single
# pixel).  The probe dispatches on real magic bytes (RIFF/WAVE,
# RIFF/AVI , GIF89a, PNM, ID3); the oracle replays the byte-signature
# classification as a CASE over the residue that chose each prefix.
# ---------------------------------------------------------------------------
@query(
    "mm07_media_triage",
    doc="header-only media triage census: container/modality counts + "
    "payload bytes per class (llmops.mediainfo.probe_media_df)",
    oracle=f"""
    SELECT CASE doc_id % 6 WHEN 0 THEN 'wav' WHEN 1 THEN 'avi'
                WHEN 2 THEN 'gif' WHEN 3 THEN 'pnm' WHEN 4 THEN 'mp3'
                ELSE 'unknown' END AS container,
           CASE doc_id % 6 WHEN 0 THEN 'audio' WHEN 1 THEN 'video'
                WHEN 2 THEN 'image' WHEN 3 THEN 'image' WHEN 4 THEN 'audio'
                ELSE NULL END AS modality,
           COUNT(*) AS n_docs,
           CAST(SUM(octet_length(encode({_DUCK_MEDIA_PREFIX} || text)))
                AS BIGINT) AS total_bytes
    FROM documents WHERE text IS NOT NULL
    GROUP BY 1, 2
    """,
)
def mm07_media_triage(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_batch_spark.llmops.mediainfo import probe_media_df

    docs = _media_prefixed_payload(_documents(spark, sf_dir))
    docs = docs.withColumn("n_bytes", F.octet_length("payload"))
    probed = probe_media_df(docs, keep_cols=("n_bytes",))
    return probed.groupBy("container", "modality").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_bytes").cast("bigint").alias("total_bytes"),
    )


# ---------------------------------------------------------------------------
# pipe05 — multimodal curation pipeline: probe → route → decode → stats.
# One probe pass classifies every payload from header bytes
# (materialized once via localCheckpoint, like pipe03/pipe04's shared
# stages); the router then filters ON THE PROBE VERDICT — wav payloads
# to decode_audio, image payloads to decode_image, mp3/video triaged
# but not decoded (their real codecs need external libraries — that IS
# the routing decision at crawl scale), everything unrecognized counted
# into the quarantine fraction.  keep_cols carries source+payload
# through the probe so routing never re-joins on doc_id (which fans
# out under duplicate ingestion).  All decode stats are md5-stub
# deterministic, so the whole composition is value-hash oracle-checked.
# ---------------------------------------------------------------------------
@query(
    "pipe05_multimodal_curation",
    doc="probe → route-on-verdict → fake-decode → per-source curation "
    "stats with quarantine fraction (mediainfo ∘ multimodal)",
    oracle=f"""
    WITH d AS (
      SELECT source, doc_id % 6 AS r,
             md5({_DUCK_MEDIA_PREFIX} || text) AS m
      FROM documents WHERE text IS NOT NULL
    )
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN r IN (0, 4) THEN 1 ELSE 0 END) AS BIGINT) AS n_audio,
           CAST(SUM(CASE WHEN r = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_video,
           CAST(SUM(CASE WHEN r IN (2, 3) THEN 1 ELSE 0 END) AS BIGINT) AS n_image,
           CAST(SUM(CASE WHEN r IN (0, 1, 2, 3, 4) THEN 0 ELSE 1 END) AS BIGINT)
             AS n_unknown,
           CAST(SUM(CASE WHEN r IN (0, 1, 2, 3, 4) THEN 0 ELSE 1 END) AS DOUBLE)
             / COUNT(*) AS quarantine_frac,
           CAST(SUM(CASE WHEN r = 0
                         THEN 1 + (('0x' || substr(m, 5, 6))::BIGINT % 100000)
                         ELSE 0 END) AS BIGINT) AS audio_frames,
           MAX(CASE WHEN r = 0
                    THEN CAST(8000 + 100 * (('0x' || substr(m, 1, 2))::BIGINT % 160)
                              AS INT) END) AS max_sample_rate,
           CAST(SUM(CASE WHEN r IN (2, 3)
                         THEN (64 + (('0x' || substr(m, 1, 2))::BIGINT % 192))
                            * (64 + (('0x' || substr(m, 3, 2))::BIGINT % 192))
                         ELSE 0 END) AS BIGINT) AS image_pixels
    FROM d GROUP BY source
    """,
)
def pipe05_multimodal_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_batch_spark.llmops.mediainfo import probe_media_df

    docs = _media_prefixed_payload(_documents(spark, sf_dir))
    # probe once, reuse for triage + both decode routes (pipe03/pipe04's
    # shared-stage materialization pattern; eager=False keeps plan
    # construction job-free)
    probed = probe_media_df(
        docs, keep_cols=("source", "payload")
    ).localCheckpoint(eager=False)

    triage = probed.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.when(F.col("modality") == "audio", 1).otherwise(0))
        .cast("bigint")
        .alias("n_audio"),
        F.sum(F.when(F.col("modality") == "video", 1).otherwise(0))
        .cast("bigint")
        .alias("n_video"),
        F.sum(F.when(F.col("modality") == "image", 1).otherwise(0))
        .cast("bigint")
        .alias("n_image"),
        F.sum(F.when(F.col("modality").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_unknown"),
    )
    triage = triage.withColumn(
        "quarantine_frac",
        F.col("n_unknown").cast("double") / F.col("n_docs"),
    )
    audio = (
        multimodal.decode_audio(
            probed.filter(F.col("container") == "wav"), id_col="source", fake=True
        )
        .groupBy("source")
        .agg(
            F.sum("n_frames").cast("bigint").alias("audio_frames"),
            F.max("sample_rate").alias("max_sample_rate"),
        )
    )
    image = (
        multimodal.decode_image(
            probed.filter(F.col("modality") == "image"), id_col="source", fake=True
        )
        .groupBy("source")
        .agg(F.sum("n_pixels").cast("bigint").alias("image_pixels"))
    )
    t, a, i = triage.alias("t"), audio.alias("a"), image.alias("i")
    return (
        t.join(a, F.col("t.source").eqNullSafe(F.col("a.source")), "left")
        .join(i, F.col("t.source").eqNullSafe(F.col("i.source")), "left")
        .select(
            "t.source",
            "t.n_docs",
            "t.n_audio",
            "t.n_video",
            "t.n_image",
            "t.n_unknown",
            "t.quarantine_frac",
            F.coalesce(F.col("a.audio_frames"), F.lit(0)).alias("audio_frames"),
            F.col("a.max_sample_rate").alias("max_sample_rate"),
            F.coalesce(F.col("i.image_pixels"), F.lit(0)).alias("image_pixels"),
        )
    )


# ---------------------------------------------------------------------------
# mm08 — MP3 frame-level census through the REAL codec (llmops/mp3.py):
# per-doc payloads are genuine MPEG audio streams fabricated by the
# structural encoder with md5-derived parameters, and the census walks
# EVERY frame header (exact duration, CBR/VBR verdict, bitrate
# min/max/mode, Xing tag) — encode→walk round-trips the codec inside
# the engine while the oracle predicts each field in closed form from
# the same md5 arithmetic.  Layer III both tiers; MPEG1 rates carry
# 1152 samples/frame, MPEG2 rates 576 — the oracle's spf CASE is the
# table the codec must agree with.  VBR docs cycle 64/128 kbps from
# frame 0, so 64 ties-or-wins the mode (tie broken low); n_frames >= 2
# keeps a VBR doc from degenerating to one 64 kbps frame.  Duration is
# an UNROUNDED int/int double division — IEEE-identical cross-engine.
# ---------------------------------------------------------------------------
@query(
    "mm08_mp3_frame_census",
    doc="real MP3 frame walk census: exact duration + bitrate census via "
    "llmops.multimodal.mp3_frame_census over structurally-real payloads",
    oracle="""
    WITH p AS (
      SELECT doc_id, source, substr(text, 1, 16) AS title,
             ('0x' || substr(md5(text), 1, 2))::BIGINT % 6 AS r_idx,
             CAST(1 + ('0x' || substr(md5(text), 3, 2))::BIGINT % 2 AS INT)
               AS channels,
             2 + ('0x' || substr(md5(text), 5, 4))::BIGINT % 40 AS n_frames,
             ('0x' || substr(md5(text), 9, 2))::BIGINT % 2 = 1 AS is_vbr,
             -- a third of payloads carry deterministic trailing junk the
             -- tolerant walk must report (not quarantine); the rest end clean
             CASE WHEN ('0x' || substr(md5(text), 13, 2))::BIGINT % 3 = 0
                  THEN 3 + ('0x' || substr(md5(text), 15, 2))::BIGINT % 13
                  ELSE 0 END AS trailing_bytes
      -- NULL text: no payload to fabricate (the attach_payload rule)
      FROM documents WHERE text IS NOT NULL
    ),
    q AS (
      SELECT *,
             CAST(CASE r_idx WHEN 0 THEN 44100 WHEN 1 THEN 48000
                             WHEN 2 THEN 32000 WHEN 3 THEN 22050
                             WHEN 4 THEN 24000 ELSE 16000 END AS INT)
               AS sample_rate,
             CASE WHEN r_idx < 3 THEN 1152 ELSE 576 END AS spf
      FROM p
    )
    SELECT doc_id, sample_rate, channels, n_frames,
           CAST(n_frames * spf AS DOUBLE) / sample_rate AS duration_s,
           is_vbr,
           CAST(CASE WHEN is_vbr THEN 64 ELSE 96 END AS INT) AS kbps_min,
           CAST(CASE WHEN is_vbr THEN 128 ELSE 96 END AS INT) AS kbps_max,
           CAST(CASE WHEN is_vbr THEN 64 ELSE 96 END AS INT) AS kbps_mode,
           CASE WHEN is_vbr THEN 'Xing' ELSE NULL END AS vbr_tag,
           CAST(trailing_bytes AS BIGINT) AS trailing_bytes,
           source AS artist, title
    FROM q
    """,
)
def mm08_mp3_frame_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    def _synth(texts, sources):
        import hashlib

        import pandas as pd

        from etl_batch_spark.llmops.mp3 import encode_frames

        rates = [44100, 48000, 32000, 22050, 24000, 16000]

        def one(t: str, src) -> bytes:
            h = hashlib.md5(t.encode("utf-8")).hexdigest()
            rate = rates[int(h[0:2], 16) % 6]
            channels = 1 + int(h[2:4], 16) % 2
            n_frames = 2 + int(h[4:8], 16) % 40
            vbr = int(h[8:10], 16) % 2 == 1
            # half the streams are CRC-protected: the Xing tag shifts by
            # 2 bytes and the walker must still find it (oracle pins it)
            crc = int(h[10:12], 16) % 2 == 1
            # a third carry trailing junk the tolerant walk must report;
            # 0x00 bytes can never resync as a frame header
            trailing = (
                3 + int(h[14:16], 16) % 13 if int(h[12:14], 16) % 3 == 0 else 0
            )
            # real ID3v2.4 text frames: TIT2 always, TPE1 only when the
            # source is non-NULL (the mm09 NULL round-trip rule)
            tags = {"TIT2": t[:16]}
            if src is not None:
                tags["TPE1"] = src
            return encode_frames(
                n_frames=n_frames,
                bitrate_kbps=[64, 128] if vbr else 96,
                sample_rate=rate,
                channels=channels,
                layer=3,
                id3_tags=tags,
                xing=vbr,
                crc=crc,
            ) + b"\x00" * trailing

        return pd.Series([one(t, s) for t, s in zip(texts, sources)])

    synth = F.pandas_udf(_synth, "binary")

    docs = (
        _documents(spark, sf_dir)
        .filter(F.col("text").isNotNull())
        .select("doc_id", synth(F.col("text"), F.col("source")).alias("payload"))
    )
    walked = multimodal.mp3_frame_census(docs)
    return walked.select(
        "doc_id",
        "sample_rate",
        "channels",
        "n_frames",
        "duration_s",
        "is_vbr",
        F.col("bitrate_kbps_min").alias("kbps_min"),
        F.col("bitrate_kbps_max").alias("kbps_max"),
        F.col("bitrate_kbps_mode").alias("kbps_mode"),
        "vbr_tag",
        "trailing_bytes",
        "artist",
        "title",
    )


# ---------------------------------------------------------------------------
# mm09 — Ogg container census through the REAL codec (llmops/oggv.py):
# spec-valid Ogg streams (page framing + CRC + Vorbis/Opus
# identification and comment headers) fabricated per doc, then the
# CRC-verified page walk extracts codec, rate, channels, EXACT duration
# from the final granule position (Opus granules are 48 kHz units
# minus pre-skip regardless of input rate — the oracle encodes that
# rule), and ARTIST/TITLE metadata.  A NULL source omits the ARTIST
# comment entirely, round-tripping to NULL on both sides.
# ---------------------------------------------------------------------------
@query(
    "mm09_ogg_metadata_census",
    doc="real Ogg page-walk census: codec/duration/metadata via "
    "llmops.multimodal.ogg_metadata_census over CRC-valid payloads",
    oracle="""
    WITH p AS (
      SELECT doc_id, source, substr(text, 1, 16) AS title,
             ('0x' || substr(md5(text), 1, 2))::BIGINT % 2 = 1 AS is_opus,
             ('0x' || substr(md5(text), 3, 2))::BIGINT % 4 AS r_idx,
             CAST(1 + ('0x' || substr(md5(text), 5, 2))::BIGINT % 2 AS INT)
               AS channels,
             1000 * (1 + ('0x' || substr(md5(text), 7, 4))::BIGINT % 120)
               AS n_units
      FROM documents WHERE text IS NOT NULL
    )
    SELECT doc_id,
           CASE WHEN is_opus THEN 'opus' ELSE 'vorbis' END AS codec,
           CAST(CASE r_idx WHEN 0 THEN 8000 WHEN 1 THEN 16000
                           WHEN 2 THEN 22050 ELSE 48000 END AS INT)
             AS sample_rate,
           channels,
           -- Opus granules are 48 kHz samples (pre-skip cancels);
           -- Vorbis granules are samples at the stream rate
           CAST(n_units AS DOUBLE)
             / CASE WHEN is_opus THEN 48000
                    ELSE CASE r_idx WHEN 0 THEN 8000 WHEN 1 THEN 16000
                                    WHEN 2 THEN 22050 ELSE 48000 END END
             AS duration_s,
           source AS artist,
           title
    FROM p
    """,
)
def mm09_ogg_metadata_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    def _synth(texts, sources):
        import hashlib

        import pandas as pd

        from etl_batch_spark.llmops.oggv import encode_ogg

        rates = [8000, 16000, 22050, 48000]

        def one(t: str, src) -> bytes:
            h = hashlib.md5(t.encode("utf-8")).hexdigest()
            codec = "opus" if int(h[0:2], 16) % 2 == 1 else "vorbis"
            rate = rates[int(h[2:4], 16) % 4]
            channels = 1 + int(h[4:6], 16) % 2
            n_units = 1000 * (1 + int(h[6:10], 16) % 120)
            comments = {"TITLE": t[:16]}
            if src is not None:
                comments["ARTIST"] = src
            return encode_ogg(
                codec=codec, sample_rate=rate, channels=channels,
                n_samples=n_units, pre_skip=312, comments=comments,
            )

        return pd.Series([one(t, s) for t, s in zip(texts, sources)])

    synth = F.pandas_udf(_synth, "binary")

    docs = (
        _documents(spark, sf_dir)
        .filter(F.col("text").isNotNull())
        .select("doc_id", synth(F.col("text"), F.col("source")).alias("payload"))
    )
    walked = multimodal.ogg_metadata_census(docs)
    return walked.select(
        "doc_id", "codec", "sample_rate", "channels", "duration_s",
        "artist", "title",
    )


# ---------------------------------------------------------------------------
# mm10 — FLAC container/frame census through the REAL codec
# (llmops/flac.py): spec-valid FLAC streams (STREAMINFO + VorbisComment
# blocks, frame headers with correct CRC-8, md5-derived parameters)
# fabricated per doc, then parse_flac walks every metadata block and
# every frame header (sync + CRC-8 + coded-number consistency),
# cross-checks walked samples against STREAMINFO, and the oracle
# predicts every census field in closed form.  The last frame is
# md5-derived SHORTER than the block size, so the walk must read the
# per-frame 16-bit block-size field, not assume uniformity.  Duration
# is an UNROUNDED int/int double division — IEEE-identical
# cross-engine.  A doc with NULL source omits ARTIST entirely,
# round-tripping to NULL on both sides (the mm09 rule).
# ---------------------------------------------------------------------------
@query(
    "mm10_flac_frame_census",
    doc="real FLAC metadata+frame walk census: exact duration, bit depth, "
    "frame count, tags via llmops.multimodal.flac_metadata_census",
    oracle="""
    WITH p AS (
      SELECT doc_id, source, substr(text, 1, 12) AS title,
             ('0x' || substr(md5(text), 1, 2))::BIGINT % 6 AS r_idx,
             CAST(1 + ('0x' || substr(md5(text), 3, 2))::BIGINT % 2 AS INT)
               AS channels,
             ('0x' || substr(md5(text), 5, 2))::BIGINT % 3 AS b_idx,
             ('0x' || substr(md5(text), 7, 2))::BIGINT % 3 AS k_idx,
             2 + ('0x' || substr(md5(text), 9, 4))::BIGINT % 20 AS n_frames,
             ('0x' || substr(md5(text), 13, 4))::BIGINT AS last_h
      FROM documents WHERE text IS NOT NULL
    ),
    q AS (
      SELECT *,
             CAST(CASE r_idx WHEN 0 THEN 44100 WHEN 1 THEN 48000
                             WHEN 2 THEN 32000 WHEN 3 THEN 22050
                             WHEN 4 THEN 96000 ELSE 11025 END AS INT)
               AS sample_rate,
             CAST(CASE b_idx WHEN 0 THEN 16 WHEN 1 THEN 24 ELSE 8 END AS INT)
               AS bits_per_sample,
             CASE k_idx WHEN 0 THEN 1024 WHEN 1 THEN 2048 ELSE 4096 END
               AS block
      FROM p
    ),
    r AS (
      SELECT *, (n_frames - 1) * block + 1 + last_h % block AS total_samples
      FROM q
    )
    SELECT doc_id, sample_rate, channels, bits_per_sample,
           CAST(n_frames AS BIGINT) AS n_frames,
           CAST(total_samples AS BIGINT) AS total_samples,
           CAST(total_samples AS DOUBLE) / sample_rate AS duration_s,
           source AS artist, title
    FROM r
    """,
)
def mm10_flac_frame_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    def _synth(texts, sources):
        import hashlib

        import pandas as pd

        from etl_batch_spark.llmops.flac import encode_flac

        rates = [44100, 48000, 32000, 22050, 96000, 11025]
        bit_depths = [16, 24, 8]
        block_sizes = [1024, 2048, 4096]

        def one(t: str, src) -> bytes:
            h = hashlib.md5(t.encode("utf-8")).hexdigest()
            block = block_sizes[int(h[6:8], 16) % 3]
            comments = {"TITLE": t[:12]}
            if src is not None:
                comments["ARTIST"] = src
            return encode_flac(
                n_frames=2 + int(h[8:12], 16) % 20,
                block_size=block,
                last_block=1 + int(h[12:16], 16) % block,
                sample_rate=rates[int(h[0:2], 16) % 6],
                channels=1 + int(h[2:4], 16) % 2,
                bits=bit_depths[int(h[4:6], 16) % 3],
                comments=comments,
                payload_bytes=24,
            )

        return pd.Series([one(t, s) for t, s in zip(texts, sources)])

    synth = F.pandas_udf(_synth, "binary")

    docs = (
        _documents(spark, sf_dir)
        .filter(F.col("text").isNotNull())
        .select("doc_id", synth(F.col("text"), F.col("source")).alias("payload"))
    )
    walked = multimodal.flac_metadata_census(docs)
    return walked.select(
        "doc_id", "sample_rate", "channels", "bits_per_sample",
        "n_frames", "total_samples", "duration_s", "artist", "title",
    )


# ---------------------------------------------------------------------------
# mm11 — MP4/ISO-BMFF track census through the REAL codec
# (llmops/mp4.py): spec-valid MP4s (full box tree, real stts/stsz/
# stsc/stco sample tables, md5-derived parameters; ~half also carry an
# audio track) fabricated per doc, then parse_mp4 walks every box,
# cross-checks stts against stsz and the mdhd declaration, and the
# oracle predicts every field in closed form.  Durations are UNROUNDED
# int/int double divisions; the movie duration is the max track
# duration rescaled by INTEGER floor division to the 1000-unit movie
# timescale — the oracle replays both exactly.
# ---------------------------------------------------------------------------
@query(
    "mm11_mp4_track_census",
    doc="real MP4 box+sample-table walk census: exact per-track durations, "
    "codec/dims/rate via llmops.multimodal.mp4_track_census",
    oracle="""
    WITH p AS (
      SELECT doc_id,
             16 * (20 + ('0x' || substr(md5(text), 1, 2))::BIGINT % 40)
               AS width,
             16 * (12 + ('0x' || substr(md5(text), 3, 2))::BIGINT % 30)
               AS height,
             24 + ('0x' || substr(md5(text), 5, 4))::BIGINT % 240
               AS v_samples,
             CASE ('0x' || substr(md5(text), 9, 2))::BIGINT % 3
                  WHEN 0 THEN 1001 WHEN 1 THEN 1000 ELSE 800 END AS v_delta,
             ('0x' || substr(md5(text), 11, 2))::BIGINT % 2 = 1 AS has_audio,
             CAST(1 + ('0x' || substr(md5(text), 13, 2))::BIGINT % 2 AS INT)
               AS a_channels,
             CASE ('0x' || substr(md5(text), 15, 2))::BIGINT % 3
                  WHEN 0 THEN 44100 WHEN 1 THEN 48000 ELSE 16000 END AS a_rate,
             40 + ('0x' || substr(md5(text), 17, 4))::BIGINT % 200
               AS a_samples
      FROM documents WHERE text IS NOT NULL
    ),
    q AS (
      SELECT *,
             v_samples * v_delta AS v_units,
             a_samples * 1024 AS a_units
      FROM p
    )
    SELECT doc_id,
           CAST(CASE WHEN has_audio THEN 2 ELSE 1 END AS INT) AS n_tracks,
           CAST(GREATEST(v_units * 1000 // 24000,
                         CASE WHEN has_audio THEN a_units * 1000 // a_rate
                              ELSE 0 END) AS DOUBLE) / 1000 AS movie_duration_s,
           'avc1' AS video_codec,
           CAST(width AS INT) AS width, CAST(height AS INT) AS height,
           CAST(v_units AS DOUBLE) / 24000 AS video_duration_s,
           CAST(v_samples AS BIGINT) AS video_samples,
           CASE WHEN has_audio THEN a_channels END AS audio_channels,
           CASE WHEN has_audio THEN CAST(a_rate AS INT) END AS audio_rate,
           CASE WHEN has_audio
                THEN CAST(a_units AS DOUBLE) / a_rate END AS audio_duration_s
    FROM q
    """,
)
def mm11_mp4_track_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    def _synth(texts):
        import hashlib

        from etl_batch_spark.llmops.mp4 import encode_mp4

        deltas = [1001, 1000, 800]
        rates = [44100, 48000, 16000]

        def one(t: str) -> bytes:
            h = hashlib.md5(t.encode("utf-8")).hexdigest()
            video = dict(
                n_samples=24 + int(h[4:8], 16) % 240,
                timescale=24000,
                sample_delta=deltas[int(h[8:10], 16) % 3],
                width=16 * (20 + int(h[0:2], 16) % 40),
                height=16 * (12 + int(h[2:4], 16) % 30),
            )
            audio = None
            if int(h[10:12], 16) % 2 == 1:
                rate = rates[int(h[14:16], 16) % 3]
                audio = dict(
                    n_samples=40 + int(h[16:20], 16) % 200,
                    timescale=rate,
                    sample_delta=1024,
                    channels=1 + int(h[12:14], 16) % 2,
                    sample_rate=rate,
                )
            return encode_mp4(video=video, audio=audio, mdat_bytes=16)

        return texts.map(one)

    synth = F.pandas_udf(_synth, "binary")

    docs = (
        _documents(spark, sf_dir)
        .filter(F.col("text").isNotNull())
        .select("doc_id", synth(F.col("text")).alias("payload"))
    )
    walked = multimodal.mp4_track_census(docs)
    return walked.select(
        "doc_id", "n_tracks", "movie_duration_s", "video_codec",
        "width", "height", "video_duration_s", "video_samples",
        "audio_channels", "audio_rate", "audio_duration_s",
    )


# ---------------------------------------------------------------------------
# tx21 — the Gopher quality-rule set (Rae et al. 2021) as a single
# native pass (llmops/text.py::gopher_rules): word-count bounds, mean
# word length, symbol ratio, bullet/ellipsis line fractions, alphabetic
# word fraction, function-word presence — per-rule evidence columns +
# the keep verdict.  Every ratio is ONE int/int double division
# (IEEE-identical cross-engine, no rounding).  The oracle re-expresses
# the rules over the same Java-\s token contract.
# ---------------------------------------------------------------------------
@query(
    "tx21_gopher_rules",
    doc="Gopher pretraining quality rules with per-rule evidence "
    "(llmops.text.gopher_rules; one scan, zero Python)",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, text, {_DUCK_TOKENS} AS toks,
             string_split(text, chr(10)) AS lns
      FROM documents WHERE text IS NOT NULL
    ),
    m AS (
      SELECT doc_id,
             CAST(len(toks) AS BIGINT) AS n_words,
             list_sum(list_transform(toks, x -> length(x)))
               / CAST(nullif(len(toks), 0) AS DOUBLE) AS mean_word_len,
             ((length(text) - length(replace(text, '#', '')))
              + (length(text) - length(replace(text, '…', ''))))
               / CAST(nullif(len(toks), 0) AS DOUBLE) AS symbol_ratio,
             len(list_filter(lns, x -> substr(ltrim(x), 1, 1) IN ('•', '-', '*')))
               / CAST(nullif(len(lns), 0) AS DOUBLE) AS bullet_frac,
             len(list_filter(lns, x -> x LIKE '%...' OR x LIKE '%…'))
               / CAST(nullif(len(lns), 0) AS DOUBLE) AS ellipsis_frac,
             len(list_filter(toks, x -> regexp_matches(x, '[a-z]')))
               / CAST(nullif(len(toks), 0) AS DOUBLE) AS alpha_frac,
             CAST(list_contains(toks, 'the')::INT + list_contains(toks, 'be')::INT
                + list_contains(toks, 'to')::INT + list_contains(toks, 'of')::INT
                + list_contains(toks, 'and')::INT + list_contains(toks, 'that')::INT
                + list_contains(toks, 'have')::INT + list_contains(toks, 'with')::INT
                AS INT) AS n_stop_hits
      FROM t
    )
    SELECT *,
           COALESCE(n_words BETWEEN 50 AND 100000
                    AND mean_word_len BETWEEN 3.0 AND 10.0
                    AND symbol_ratio <= 0.1
                    AND bullet_frac <= 0.9
                    AND ellipsis_frac <= 0.3
                    AND alpha_frac >= 0.8
                    AND n_stop_hits >= 2, FALSE) AS keep
    FROM m
    """,
)
def tx21_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _documents(spark, sf_dir).filter(F.col("text").isNotNull())
    return text.gopher_rules(docs)


# ---------------------------------------------------------------------------
# pipe06 — audio curation end-to-end through the REAL container codecs:
# mixed payloads (genuine MPEG frames, CRC-valid Ogg pages, garbage) →
# header probe (one pass, materialized once) → route ON THE PROBE
# VERDICT → mp3 route walks every frame (llmops/mp3.py), ogg route
# walks every page (llmops/oggv.py) → per-container census.  Duration
# totals are EXACT with no rounding: each route sums the integer
# frame/granule counts (fixture rates are uniform per container) and
# divides ONCE — int/int division is IEEE-identical cross-engine,
# whereas summing per-doc double durations would expose reduction-order
# low bits to the hash.  The residue that picks each payload class is
# computed ENGINE-side (doc_id % 3, Spark semantics == DuckDB
# semantics, negatives fall to the garbage branch on both) and handed
# to the synthesis UDF — deriving it in Python would diverge on
# negative ids (Python % floors; SQL % truncates).
# ---------------------------------------------------------------------------
@query(
    "pipe06_audio_curation",
    doc="probe → route → real frame/page walk → census over mixed audio "
    "payloads (mediainfo ∘ mp3_frame_census ∘ ogg_metadata_census)",
    oracle="""
    WITH p AS (
      SELECT doc_id, text,
             CASE doc_id % 3 WHEN 0 THEN 'mp3' WHEN 1 THEN 'ogg'
                  ELSE 'unknown' END AS container,
             2 + ('0x' || substr(md5(text), 1, 4))::BIGINT % 30 AS n_frames,
             1000 * (1 + ('0x' || substr(md5(text), 5, 4))::BIGINT % 90)
               AS n_units
      FROM documents WHERE text IS NOT NULL
    )
    SELECT container,
           COUNT(*) AS n_docs,
           CASE container
             WHEN 'mp3' THEN CAST(SUM(n_frames) * 1152 AS DOUBLE) / 44100
             WHEN 'ogg' THEN CAST(SUM(n_units) AS DOUBLE) / 22050
             ELSE NULL
           END AS total_duration_s
    FROM p
    GROUP BY container
    """,
)
def pipe06_audio_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_batch_spark.llmops.mediainfo import probe_media_df

    def _synth(residues, texts):
        import hashlib

        import pandas as pd

        from etl_batch_spark.llmops.mp3 import encode_frames
        from etl_batch_spark.llmops.oggv import encode_ogg

        def one(r, t: str) -> bytes:
            h = hashlib.md5(t.encode("utf-8")).hexdigest()
            if r == 0:
                return encode_frames(
                    n_frames=2 + int(h[0:4], 16) % 30, bitrate_kbps=128,
                    sample_rate=44100, channels=2, layer=3,
                )
            if r == 1:
                return encode_ogg(
                    codec="vorbis", sample_rate=22050, channels=1,
                    n_samples=1000 * (1 + int(h[4:8], 16) % 90),
                )
            return b"ZZZZ" + t.encode("utf-8")

        return pd.Series([one(r, t) for r, t in zip(residues, texts)])

    synth = F.pandas_udf(_synth, "binary")
    docs = (
        _documents(spark, sf_dir)
        .filter(F.col("text").isNotNull())
        .select(
            "doc_id",
            synth((F.col("doc_id") % 3).cast("long"), F.col("text")).alias("payload"),
        )
    )
    # probe once, reuse for the census + both decode routes
    probed = probe_media_df(docs, keep_cols=("payload",)).localCheckpoint(
        eager=False
    )
    mp3_stats = (
        multimodal.mp3_frame_census(
            probed.filter(F.col("container") == "mp3").select("doc_id", "payload")
        )
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_frames").alias("total_frames"),
        )
        .select(
            F.lit("mp3").alias("container"),
            "n_docs",
            (F.col("total_frames") * 1152 / F.lit(44100)).alias("total_duration_s"),
        )
    )
    # Ogg granules ARE the sample count at the stream rate (vorbis);
    # recover the exact integer unit total from the per-doc durations
    # the walk emits: duration * 22050 is integral by construction
    ogg_stats = (
        multimodal.ogg_metadata_census(
            probed.filter(F.col("container") == "ogg").select("doc_id", "payload")
        )
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.round(F.col("duration_s") * 22050).cast("long")).alias("units"),
        )
        .select(
            F.lit("ogg").alias("container"),
            "n_docs",
            (F.col("units").cast("double") / F.lit(22050)).alias("total_duration_s"),
        )
    )
    unknown = (
        probed.filter(~F.col("container").isin("mp3", "ogg"))
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .select(
            F.lit("unknown").alias("container"),
            "n_docs",
            F.lit(None).cast("double").alias("total_duration_s"),
        )
    )
    return mp3_stats.unionByName(ogg_stats).unionByName(unknown).filter(
        F.col("n_docs") > 0
    )


# ---------------------------------------------------------------------------
# mm12 — WebP container census through the REAL probe (llmops/webp.py):
# spec-valid WebP payloads (RIFF framing, VP8 keyframe headers per
# RFC 6386 §9.1, VP8L lossless headers, VP8X extended files with
# ANIM/ANMF animation chunks) fabricated per doc from md5(text), then
# parse_webp's chunk walk extracts variant, canvas dims, alpha,
# animation frame count + total duration, and EXIF/ICC presence — the
# oracle predicts every field in closed form.  Extended docs are
# always animated so the fixture never silently demotes to the simple
# form; lossless-vs-lossy and all flag bits vary per doc.  Header-only
# (pixel decode quarantined, like H.264 in mm11) — the last common
# crawl image payload without a census tier, closing the breadth
# track.
# ---------------------------------------------------------------------------
@query(
    "mm12_webp_structure_census",
    doc="real WebP chunk-walk census: variant/dims/alpha/animation/"
    "metadata via llmops.multimodal.webp_structure_census over "
    "spec-valid RIFF payloads",
    oracle="""
    WITH p AS (
      SELECT doc_id,
             ('0x' || substr(md5(text), 1, 2))::BIGINT % 3 AS v_idx,
             CAST(16 + ('0x' || substr(md5(text), 3, 4))::BIGINT % 4000
                  AS INT) AS width,
             CAST(16 + ('0x' || substr(md5(text), 7, 4))::BIGINT % 3000
                  AS INT) AS height,
             ('0x' || substr(md5(text), 11, 2))::BIGINT % 2 = 1 AS alpha_bit,
             CAST(2 + ('0x' || substr(md5(text), 13, 2))::BIGINT % 6
                  AS INT) AS n_fr,
             10 * (1 + ('0x' || substr(md5(text), 15, 2))::BIGINT % 50)
               AS per_ms,
             ('0x' || substr(md5(text), 17, 2))::BIGINT % 2 = 1 AS exif_bit,
             ('0x' || substr(md5(text), 19, 2))::BIGINT % 2 = 1 AS icc_bit
      FROM documents WHERE text IS NOT NULL
    )
    SELECT doc_id,
           CASE v_idx WHEN 0 THEN 'lossy' WHEN 1 THEN 'lossless'
                ELSE 'extended' END AS variant,
           width, height,
           CASE WHEN v_idx = 0 THEN FALSE ELSE alpha_bit END AS has_alpha,
           v_idx = 2 AS is_animated,
           CASE WHEN v_idx = 2 THEN n_fr ELSE 1 END AS n_frames,
           CAST(CASE WHEN v_idx = 2 THEN n_fr * per_ms ELSE 0 END
                AS BIGINT) AS duration_ms,
           v_idx = 2 AND exif_bit AS has_exif,
           v_idx = 2 AND icc_bit AS has_icc
    FROM p
    """,
)
def mm12_webp_structure_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    def _synth(texts):
        import hashlib

        import pandas as pd

        from etl_batch_spark.llmops.webp import encode_webp

        def one(t: str) -> bytes:
            h = hashlib.md5(t.encode("utf-8")).hexdigest()
            v_idx = int(h[0:2], 16) % 3
            width = 16 + int(h[2:6], 16) % 4000
            height = 16 + int(h[6:10], 16) % 3000
            alpha = int(h[10:12], 16) % 2 == 1
            n_fr = 2 + int(h[12:14], 16) % 6
            per_ms = 10 * (1 + int(h[14:16], 16) % 50)
            exif = int(h[16:18], 16) % 2 == 1
            icc = int(h[18:20], 16) % 2 == 1
            if v_idx == 0:
                return encode_webp(width=width, height=height)
            if v_idx == 1:
                return encode_webp(
                    width=width, height=height, lossless=True, alpha=alpha
                )
            return encode_webp(
                width=width, height=height, alpha=alpha,
                frame_durations_ms=[per_ms] * n_fr, exif=exif, icc=icc,
            )

        return pd.Series([one(t) for t in texts])

    synth = F.pandas_udf(_synth, "binary")

    docs = (
        _documents(spark, sf_dir)
        .filter(F.col("text").isNotNull())
        .select("doc_id", synth(F.col("text")).alias("payload"))
    )
    walked = multimodal.webp_structure_census(docs)
    return walked.select(
        "doc_id", "variant", "width", "height", "has_alpha", "is_animated",
        "n_frames", "duration_ms", "has_exif", "has_icc",
    )


# ---------------------------------------------------------------------------
# tx22 — URL curation (llmops/text.py::normalize_url /
# with_registered_domain): the crawl-pipeline staple (CCNet /
# RefinedWeb / FineWeb cap documents per registered domain and dedupe
# by canonical URL).  Messy URLs are fabricated natively from
# md5(text) — mixed-case scheme/host, www/cdn subdomains, default and
# explicit ports, trailing slashes, utm_*/gclid tracking params
# sandwiching the real param, fragments — then the native normalizer
# (parse_url + codegen'd string expressions, zero Python)
# canonicalizes, the FULL-Public-Suffix-List eTLD+1 (five broadcast
# hash probes against the vendored PSL dimension, llmops/psl.py)
# extracts the registered domain, and a per-domain quota keeps the 20
# longest docs (n_chars DESC NULLS LAST, doc_id ASC tiebreak, both
# sides pinned).  The oracle reconstructs the EXPECTED canonical URL
# in closed form from the same hash bits — an independent
# construction, not a re-implementation of the normalizer.
# ---------------------------------------------------------------------------
@query(
    "tx22_url_curation",
    doc="URL normalization + registered-domain quota at scan speed: "
    "llmops.text.normalize_url / registered_domain over fabricated "
    "messy URLs, per-domain top-20 keep ranking",
    oracle="""
    WITH p AS (
      SELECT doc_id, n_chars,
             ('0x' || substr(md5(text), 1, 2))::BIGINT % 2 AS https_bit,
             ('0x' || substr(md5(text), 5, 2))::BIGINT % 3 AS sub_i,
             ('0x' || substr(md5(text), 7, 4))::BIGINT % 1000 AS base_n,
             ('0x' || substr(md5(text), 11, 2))::BIGINT % 6 AS tld_i,
             ('0x' || substr(md5(text), 13, 2))::BIGINT % 3 AS port_i,
             substr(md5(text), 15, 4) AS pseg,
             ('0x' || substr(md5(text), 23, 4))::BIGINT % 10000 AS idn
      FROM documents WHERE text IS NOT NULL
    ),
    u AS (
      SELECT doc_id, n_chars,
             CASE WHEN https_bit = 1 THEN 'https' ELSE 'http' END
               || '://'
               || CASE sub_i WHEN 2 THEN 'cdn.' ELSE '' END
               || 'site' || base_n || '.'
               || CASE tld_i WHEN 0 THEN 'com' WHEN 1 THEN 'org'
                             WHEN 2 THEN 'net' WHEN 3 THEN 'io'
                             WHEN 4 THEN 'co.uk' ELSE 'com.au' END
               || CASE WHEN port_i = 2 THEN ':8080' ELSE '' END
               || '/p/' || pseg || '?id=' || idn AS url_norm,
             'site' || base_n || '.'
               || CASE tld_i WHEN 0 THEN 'com' WHEN 1 THEN 'org'
                             WHEN 2 THEN 'net' WHEN 3 THEN 'io'
                             WHEN 4 THEN 'co.uk' ELSE 'com.au' END
               AS domain
      FROM p
    )
    SELECT doc_id, url_norm, domain,
           ROW_NUMBER() OVER (
             PARTITION BY domain
             ORDER BY n_chars DESC NULLS LAST, doc_id ASC NULLS LAST
           ) <= 20 AS kept
    FROM u
    """,
)
def tx22_url_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from etl_batch_spark.llmops.text import (
        normalize_url, with_registered_domain,
    )

    d = _documents(spark, sf_dir).filter(F.col("text").isNotNull())
    h = F.md5(F.col("text"))

    def hx(pos: int, ln: int):
        return F.conv(F.substring(h, pos, ln), 16, 10).cast("long")

    scheme = F.when(hx(1, 2) % 2 == 1, "https").otherwise("http")
    up = hx(3, 2) % 2 == 1
    sub = F.element_at(F.array(F.lit(""), F.lit("www."), F.lit("cdn.")),
                       (hx(5, 2) % 3 + 1).cast("int"))
    tld = F.element_at(
        F.array(*[F.lit(t) for t in
                  ("com", "org", "net", "io", "co.uk", "com.au")]),
        (hx(11, 2) % 6 + 1).cast("int"),
    )
    host = F.concat(sub, F.lit("site"), hx(7, 4) % 1000, F.lit("."), tld)
    port_i = hx(13, 2) % 3
    port = F.when(port_i == 1,
                  F.when(scheme == "https", ":443").otherwise(":80")) \
        .when(port_i == 2, F.lit(":8080")).otherwise(F.lit(""))
    path = F.concat(F.lit("/p/"), F.substring(h, 15, 4),
                    F.when(hx(19, 2) % 2 == 1, "/").otherwise(""))
    idp = F.concat(F.lit("id="), hx(23, 4) % 10000)
    qs = F.when(hx(21, 2) % 2 == 1,
                F.concat(F.lit("utm_source=x&"), idp, F.lit("&gclid=1"))) \
        .otherwise(idp)
    frag = F.when(hx(27, 2) % 2 == 1, "#sec").otherwise(F.lit(""))
    messy = F.concat(
        scheme, F.lit("://"), F.when(up, F.upper(host)).otherwise(host),
        port, path, F.lit("?"), qs, frag,
    )

    d = d.select(
        "doc_id", "n_chars", messy.alias("url"),
        F.parse_url(messy, F.lit("HOST")).alias("__host"),
    )
    # broadcast-join PSL variant: full public-suffix list, small plan
    d = with_registered_domain(d, "__host", "domain")
    d = d.select(
        "doc_id", "n_chars",
        normalize_url(F.col("url")).alias("url_norm"),
        "domain",
    )
    rn = F.row_number().over(
        W.partitionBy("domain").orderBy(
            F.col("n_chars").desc_nulls_last(),
            F.col("doc_id").asc_nulls_last(),
        )
    )
    return d.select(
        "doc_id", "url_norm", "domain", (rn <= 20).alias("kept")
    )


# ---------------------------------------------------------------------------
# tx23 — registered-domain extraction under the FULL Public Suffix List
# (llmops/text.py::registered_domain over llmops/psl.py's vendored
# Mozilla list).  Hosts are fabricated natively from md5(text) bits to
# cover every PSL rule class a crawl-curation pipeline hits on day one:
# a private-section suffix (github.io), a 3-label exact rule
# (act.edu.au), a wildcard rule (*.ck), an exception rule (!www.ck),
# the co.uk family, an unknown TLD (the default '*' rule), and a host
# that IS a public suffix (graceful self-return).  The operator is an
# InSet-compiled native when-chain — no join, no Python; the oracle
# states the expected eTLD+1 PER SHAPE in closed form, an independent
# construction that does not re-run any suffix matching.
# ---------------------------------------------------------------------------
@query(
    "tx23_registered_domain_psl",
    doc="full-PSL eTLD+1: exact/private/wildcard/exception/default rule "
    "classes over fabricated hosts, matched against a closed-form "
    "per-shape oracle",
    oracle="""
    WITH p AS (
      SELECT doc_id,
             ('0x' || substr(md5(text), 1, 2))::BIGINT % 8 AS shape_i,
             ('0x' || substr(md5(text), 5, 2))::BIGINT % 2 AS up_bit,
             ('0x' || substr(md5(text), 7, 4))::BIGINT % 1000 AS n
      FROM documents WHERE text IS NOT NULL
    ),
    u AS (
      SELECT doc_id, up_bit,
             CASE shape_i
               WHEN 0 THEN 'site' || n || '.com'
               WHEN 1 THEN 'a.user' || n || '.github.io'
               WHEN 2 THEN 'www.x' || n || '.act.edu.au'
               WHEN 3 THEN 'a.b' || n || '.zone.ck'
               WHEN 4 THEN 'foo' || n || '.www.ck'
               WHEN 5 THEN 'cdn.site' || n || '.co.uk'
               WHEN 6 THEN 'site' || n || '.unknowntld'
               ELSE 'com.au' END AS host_lc,
             CASE shape_i
               WHEN 0 THEN 'site' || n || '.com'
               WHEN 1 THEN 'user' || n || '.github.io'
               WHEN 2 THEN 'x' || n || '.act.edu.au'
               WHEN 3 THEN 'b' || n || '.zone.ck'
               WHEN 4 THEN 'www.ck'
               WHEN 5 THEN 'site' || n || '.co.uk'
               WHEN 6 THEN 'site' || n || '.unknowntld'
               ELSE 'com.au' END AS domain
      FROM p
    )
    SELECT doc_id,
           CASE WHEN up_bit = 1 THEN upper(host_lc) ELSE host_lc END
             AS host,
           domain
    FROM u
    """,
)
def tx23_registered_domain_psl(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_batch_spark.llmops.text import with_registered_domain

    d = _documents(spark, sf_dir).filter(F.col("text").isNotNull())
    h = F.md5(F.col("text"))

    def hx(pos: int, ln: int):
        return F.conv(F.substring(h, pos, ln), 16, 10).cast("long")

    shape = hx(1, 2) % 8
    up = hx(5, 2) % 2 == 1
    n = hx(7, 4) % 1000
    host = (
        F.when(shape == 0, F.concat(F.lit("site"), n, F.lit(".com")))
        .when(shape == 1, F.concat(F.lit("a.user"), n, F.lit(".github.io")))
        .when(shape == 2, F.concat(F.lit("www.x"), n, F.lit(".act.edu.au")))
        .when(shape == 3, F.concat(F.lit("a.b"), n, F.lit(".zone.ck")))
        .when(shape == 4, F.concat(F.lit("foo"), n, F.lit(".www.ck")))
        .when(shape == 5, F.concat(F.lit("cdn.site"), n, F.lit(".co.uk")))
        .when(shape == 6, F.concat(F.lit("site"), n, F.lit(".unknowntld")))
        .otherwise(F.lit("com.au"))
    )
    messy = F.when(up, F.upper(host)).otherwise(host)
    d = d.select("doc_id", messy.alias("host"))
    return with_registered_domain(d, "host", "domain")


# ---------------------------------------------------------------------------
# dd14 — C4-style GLOBAL line dedup (llmops/dedup.py::dedup_lines_global):
# every distinct line survives once in the whole corpus, in the doc
# where it first occurs (doc_id, then line index), and is removed
# everywhere else; docs reassemble in original line order.  The plan is
# the skew-safe one: winner-per-line via groupBy+min(struct) (map-side
# combine absorbs the blank-line hot key) rather than a data-sized
# window partition.  DISTINCT (doc_id, text) seeds both sides
# (entity-keyed op under duplicate ingestion); NULL text / NULL doc_id
# excluded on both sides (an unkeyed doc has no deterministic claim to
# first occurrence).
# ---------------------------------------------------------------------------
@query(
    "dd14_line_dedup",
    doc="global first-occurrence line dedup with in-order document "
    "reassembly (the C4 curation op) — value-hash compared against the "
    "ROW_NUMBER-over-line oracle",
    oracle="""
    WITH docs AS (
      SELECT DISTINCT doc_id, text FROM documents
      WHERE text IS NOT NULL AND doc_id IS NOT NULL
    ),
    lines AS (
      SELECT doc_id, g.i AS idx, ls[g.i] AS line
      FROM (SELECT doc_id, string_split(text, chr(10)) AS ls FROM docs),
           LATERAL (SELECT unnest(generate_series(1, len(ls))) AS i) g
    ),
    kept AS (
      SELECT doc_id, idx, line,
             ROW_NUMBER() OVER (PARTITION BY line ORDER BY doc_id, idx)
               AS rn
      FROM lines
    )
    SELECT d.doc_id,
           COALESCE(string_agg(k.line, chr(10) ORDER BY k.idx), '')
             AS text_dedup,
           COUNT(k.line) AS n_kept,
           len(string_split(ANY_VALUE(d.text), chr(10))) - COUNT(k.line)
             AS n_dropped
    FROM docs d
    LEFT JOIN (SELECT * FROM kept WHERE rn = 1) k USING (doc_id)
    GROUP BY d.doc_id
    """,
)
def dd14_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _documents(spark, sf_dir).select("doc_id", "text").distinct()
    return dedup.dedup_lines_global(docs).select(
        "doc_id", "text_dedup", "n_kept", "n_dropped"
    )
