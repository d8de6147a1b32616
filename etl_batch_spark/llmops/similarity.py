"""Embedding similarity search.

- :func:`cosine_topk`      — exact brute-force top-k for a (small) query
  set: queries broadcast, corpus streams through one scan.  The baseline.
- :func:`signbit_bucket` / :func:`bucketed_topk` — LSH-bucketed ANN (the
  scale path): sign-bit bucket key, candidates via equi-join on the
  bucket, cosine only within bucket.  O(n·bucket_size) instead of O(n²).

All vector math runs in Spark higher-order functions (zip_with +
aggregate folds), elementwise in double — JVM-side, no Python UDFs, and
deterministic fold order (parity-testable against other engines).
A Pandas-UDF path is deliberately absent: for 64-4096-dim float vectors
the codegen'd fold is within the Arrow transfer cost, without leaving
the JVM.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

from etl_batch_spark.catalog import fan_out

DOT = "aggregate(zip_with({a}, {b}, (x, y) -> x * y), cast(0.0 as double), (acc, x) -> acc + x)"


def as_double(col: str = "embedding") -> Column:
    return F.expr(f"transform({col}, x -> cast(x as double))")


def l2_norm(col: str = "e") -> Column:
    return F.sqrt(F.expr(f"aggregate({col}, cast(0.0 as double), (acc, x) -> acc + x * x)"))


def _normed(df: DataFrame, *, id_col: str, vec_col: str) -> DataFrame:
    # fan_out: the cosine folds downstream are per-row CPU — a
    # single-split corpus file must not serialize them on one core
    return fan_out(df).select(
        F.col(id_col), as_double(vec_col).alias("e")
    ).withColumn("nrm", l2_norm("e"))


def _seed_local(
    corpus: DataFrame, *, id_col: str, vec_col: str, n: int
) -> DataFrame:
    """First ``n`` normed rows by id, re-materialized as a LOCAL relation.

    The deterministic seed/codebook picks (ivf_topk, semantic_dedup,
    pq codebooks) are broadcast against the corpus — sometimes twice per
    query (assignment side + query side).  Broadcasting the lazy
    ``orderBy(id).limit(n)`` subtree makes EVERY broadcast replay a full
    corpus scan + TakeOrdered (no exchange reuse: column pruning
    specializes each copy).  The pick is bounded state — n rows of one
    embedding each, the k-means-centroid precedent — so collect it once
    and hand consumers a plan-literal LocalRelation: zero corpus scans
    per broadcast, and one fewer job per consumer.  Values round-trip
    bit-exactly (IEEE doubles through the Python driver).

    Deliberately built from the UNFANNED corpus: ``fan_out``'s
    repartition exists for the downstream per-row cosine folds, but for
    this pick it would turn a shuffle-free TakeOrderedAndProject
    (map-side top-n, driver merge) into a full corpus exchange —
    measured as most of the pick's cost.  e/nrm are computed in the
    same projection, so the collected values are the exact doubles the
    fanned path would produce (repartition does not touch values)."""
    d = corpus.select(F.col(id_col), as_double(vec_col).alias("e")).withColumn(
        "nrm", l2_norm("e")
    )
    rows = d.orderBy(id_col).limit(n).collect()
    return corpus.sparkSession.createDataFrame(rows, d.schema)


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
) -> DataFrame:
    """(query_id, neighbor_id, cosine): exact top-k neighbors per query.
    ``queries`` must be small enough to broadcast (it is hinted)."""
    c = _normed(corpus, id_col=id_col, vec_col=vec_col).select(
        F.col(id_col).alias("neighbor_id"), F.col("e").alias("ce"), F.col("nrm").alias("cn")
    )
    q = _normed(queries, id_col=id_col, vec_col=vec_col).select(
        F.col(id_col).alias("query_id"), F.col("e").alias("qe"), F.col("nrm").alias("qn")
    )
    dot = F.expr(DOT.format(a="qe", b="ce"))
    pairs = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(dot / (F.col("qn") * F.col("cn")), round_to).alias("cosine"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "cosine")
    )


def signbit_bucket(vec_expr: str = "e", n_bits: int = 6, offset: int = 0) -> Column:
    """Bucket key from the sign bits of ``n_bits`` dimensions starting at
    ``offset`` — a fixed-hyperplane LSH surrogate (deterministic,
    engine-portable).  For isotropic embeddings this yields ~2^n_bits
    balanced buckets; distinct offsets give independent hash tables for
    the OR-construction (:func:`multitable_topk`)."""
    terms = " + ".join(
        f"case when {vec_expr}[{offset + i}] > 0 then {1 << i} else 0 end"
        for i in range(n_bits)
    )
    return F.expr(f"({terms})")


def neardup_pairs(
    df: DataFrame,
    *,
    threshold: float = 0.35,
    n_bits: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (id_a, id_b, cosine) with
    id_a < id_b and cosine ≥ threshold.

    Candidates come from a self-equi-join on the sign-bit bucket — true
    near-dups (cosine → 1) agree on every sign bit, so recall for actual
    duplicates is high while the join stays linear: with ``n_bits`` b the
    expected bucket size is n/2^b, so raise b as the corpus grows to keep
    per-bucket fanout bounded.  The threshold is applied to the *rounded*
    cosine so boundary behavior is identical across engines.
    """
    v = _normed(df, id_col=id_col, vec_col=vec_col).withColumn(
        "bucket", signbit_bucket("e", n_bits)
    )
    a = v.select(
        F.col(id_col).alias("id_a"), F.col("e").alias("ea"), F.col("nrm").alias("na"), "bucket"
    )
    b = v.select(
        F.col(id_col).alias("id_b"), F.col("e").alias("eb"), F.col("nrm").alias("nb"), "bucket"
    )
    cos = F.round(
        F.expr(DOT.format(a="ea", b="eb")) / (F.col("na") * F.col("nb")), round_to
    )
    return (
        a.join(b, ["bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", cos)
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    k: int = 3,
    n_centroids: int = 16,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
) -> DataFrame:
    """IVF-Flat approximate top-k: partition the corpus into inverted
    lists by nearest centroid, probe the query's ``nprobe`` nearest lists.

    Centroids here are the first ``n_centroids`` corpus vectors by id — a
    deterministic seed pick that keeps the operator engine-portable and
    oracle-checkable; a production index would train them with
    ``pyspark.ml.clustering.KMeans`` and the rest of the plan is
    unchanged.  Costs at scale: assignment is one broadcast of C
    centroids against a single corpus scan (C cosine folds per row, no
    shuffle), search is an equi-join on the centroid id — never a cross
    join against the corpus.
    """
    c = _normed(corpus, id_col=id_col, vec_col=vec_col)
    # first n_centroids vectors BY id (orderBy+limit), not filter(id < n):
    # the filter form silently seeds nothing when ids are sparse/offset.
    # Collected to a LocalRelation once (_seed_local): both broadcasts
    # below otherwise replay a corpus scan + TakeOrdered each.
    cents = _seed_local(
        corpus, id_col=id_col, vec_col=vec_col, n=n_centroids
    ).select(
        F.col(id_col).alias("cent_id"), F.col("e").alias("ce"), F.col("nrm").alias("cn")
    )
    sim = F.round(
        F.expr(DOT.format(a="e", b="ce")) / (F.col("nrm") * F.col("cn")), round_to
    )
    # corpus-side argmin via min(struct(...)): identical pick to a
    # row_number window (maximize sim, tie on cent_id — the ordering
    # keys lead the struct and are unique per group), but PARTIAL-
    # aggregable: the ×C broadcast expansion collapses map-side, so the
    # shuffle carries rows, not rows×C, and there is no sort
    assign = (
        c.crossJoin(F.broadcast(cents))
        .withColumn("sim", sim)
        .groupBy(id_col)
        .agg(
            F.min(
                F.struct(
                    (-F.col("sim")).alias("negsim"),
                    F.col("cent_id").alias("cent_id"),
                    F.col("e").alias("e"),
                    F.col("nrm").alias("nrm"),
                )
            ).alias("best")
        )
        .select(F.col(id_col), F.col("best.e").alias("e"),
                F.col("best.nrm").alias("nrm"), F.col("best.cent_id").alias("cent_id"))
    )
    q = _normed(queries, id_col=id_col, vec_col=vec_col)
    # the query side needs top-NPROBE (not argmin) — a window is right
    # here, and it runs over the small query set only
    rn_w = W.partitionBy(id_col).orderBy(F.desc("sim"), F.asc("cent_id"))
    qprobe = (
        q.crossJoin(F.broadcast(cents))
        .withColumn("sim", sim)
        .withColumn("rn", F.row_number().over(rn_w))
        .filter(F.col("rn") <= nprobe)
        .select(
            F.col(id_col).alias("query_id"),
            F.col("e").alias("qe"),
            F.col("nrm").alias("qn"),
            "cent_id",
        )
    )
    dot = F.expr(DOT.format(a="qe", b="e"))
    pairs = (
        assign.join(F.broadcast(qprobe), "cent_id")
        .filter(F.col(id_col) != F.col("query_id"))
        .select(
            "query_id",
            F.col(id_col).alias("neighbor_id"),
            F.round(dot / (F.col("qn") * F.col("nrm")), round_to).alias("cosine"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "cosine")
    )


def bucketed_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    k: int = 3,
    n_bits: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
) -> DataFrame:
    """LSH-bucketed approximate top-k: candidates share the query's
    sign-bit bucket.  Recall can be raised by probing neighboring buckets
    (multi-probe) — at 100 TB the equi-join shape is what matters."""
    c = _normed(corpus, id_col=id_col, vec_col=vec_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col("e").alias("ce"),
        F.col("nrm").alias("cn"),
        signbit_bucket("e", n_bits).alias("cbucket"),
    )
    q = _normed(queries, id_col=id_col, vec_col=vec_col).select(
        F.col(id_col).alias("query_id"),
        F.col("e").alias("qe"),
        F.col("nrm").alias("qn"),
        signbit_bucket("e", n_bits).alias("qbucket"),
    )
    dot = F.expr(DOT.format(a="qe", b="ce"))
    pairs = (
        c.join(
            F.broadcast(q),
            (F.col("cbucket") == F.col("qbucket"))
            & (F.col("neighbor_id") != F.col("query_id")),
        )
        .select(
            "query_id",
            "neighbor_id",
            F.round(dot / (F.col("qn") * F.col("cn")), round_to).alias("cosine"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "cosine")
    )


def multitable_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    k: int = 3,
    n_bits: int = 6,
    n_tables: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
) -> DataFrame:
    """Multi-table LSH ANN (the OR-construction): table ``t`` buckets on
    the sign bits of dimensions ``[t·n_bits, (t+1)·n_bits)``; a corpus
    vector is a candidate if it shares the query's bucket in ANY table.
    L independent tables raise recall from ``p`` to ``1-(1-p)^L`` while
    the per-table cost stays the linear equi-join of
    :func:`bucketed_topk` — the standard recall/cost dial (tune L and
    n_bits with the ss12 recall harness).  Candidate pairs found by
    several tables are deduplicated by a (query, neighbor) aggregate
    before ranking — shuffle width ≤ L·bucket_size per query, never the
    corpus."""
    # Each table reads a DISJOINT slice of n_bits dimensions; a slice past
    # the embedding's end would (with ANSI off) read NULL → bit 0 for every
    # row, silently collapsing that table into one giant bucket (its
    # "linear equi-join" becomes a corpus × queries cross join).  The
    # LIMIT-1 probe below catches the config-error case cheaply but
    # ASSUMES uniform dimensionality — a ragged corpus whose later rows
    # are shorter slips past it.  That case still fails loudly rather
    # than silently here: this engine's session runs ANSI mode (on by
    # default in Spark 4, pinned by get_spark), where an out-of-bounds
    # `vec[i]` raises INVALID_ARRAY_INDEX at execution.  Callers running
    # ANSI-off sessions must pre-validate min(size(vec)) themselves
    # (session.get_spark pins spark.sql.ansi.enabled=true for this).
    probe = corpus.select(F.size(F.col(vec_col)).alias("d")).head(1)
    if probe and probe[0]["d"] < n_tables * n_bits:
        raise ValueError(
            f"multitable_topk needs dim >= n_tables*n_bits = "
            f"{n_tables * n_bits}, but {vec_col} has dim {probe[0]['d']}; "
            f"lower n_tables/n_bits or random_project to a wider dim"
        )
    c = _normed(corpus, id_col=id_col, vec_col=vec_col)
    q = _normed(queries, id_col=id_col, vec_col=vec_col)
    dot = F.expr(DOT.format(a="qe", b="ce"))

    # ONE corpus scan for all L tables: each row computes its L bucket
    # ids in a single projection and posexplodes to (table, bucket)
    # rows — the previous per-table loop unioned L separate corpus
    # scans and L broadcast joins (3 scans / 11 Exchanges in ss13's
    # executed plan).  The join key gains the table index, so the
    # candidate multiset is pair-for-pair the union of the per-table
    # equi-joins, and the max() dedup below is unchanged.
    def buckets(e_col: str) -> Column:
        return F.array(
            *[
                signbit_bucket(e_col, n_bits, offset=t * n_bits)
                for t in range(n_tables)
            ]
        )

    ct = c.select(
        F.col(id_col).alias("neighbor_id"),
        F.col("e").alias("ce"),
        F.col("nrm").alias("cn"),
        F.posexplode(buckets("e")).alias("t", "cbucket"),
    )
    qt = q.select(
        F.col(id_col).alias("query_id"),
        F.col("e").alias("qe"),
        F.col("nrm").alias("qn"),
        F.posexplode(buckets("e")).alias("qt", "qbucket"),
    )
    pairs = ct.join(
        F.broadcast(qt),
        (F.col("t") == F.col("qt"))
        & (F.col("cbucket") == F.col("qbucket"))
        & (F.col("neighbor_id") != F.col("query_id")),
    ).select(
        "query_id",
        "neighbor_id",
        F.round(dot / (F.col("qn") * F.col("cn")), round_to).alias("cosine"),
    )
    # same pair from several tables scores identically: max() dedups
    deduped = pairs.groupBy("query_id", "neighbor_id").agg(
        F.max("cosine").alias("cosine")
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        deduped.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "cosine")
    )


SQDIST = (
    "aggregate(zip_with({a}, {b}, (x, y) -> (x - y) * (x - y)), "
    "cast(0.0 as double), (acc, x) -> acc + x)"
)


def kmeans_lloyd(
    df: DataFrame,
    *,
    k: int = 8,
    max_iterations: int = 10,
    dim: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, cluster, sqdist) after Lloyd's iterations — the IVF-index
    trainer and general embedding clusterer.

    Spark-first shape per round: assignment broadcasts the k-row
    centroid table against a corpus scan (k squared-L2 folds per row
    via a window argmin — the same plan ``ivf_topk`` uses, so codegen
    stays small no matter k); the update step is one groupBy(cluster)
    with an ``avg`` per dimension — one shuffle, map-side partial.  The
    k×dim centroid matrix (the only thing collected) is aggregate
    state, the same thing ``pyspark.ml``'s KMeans ships each round;
    data rows never reach the driver.  Seeding is the first k vectors
    by id — deterministic, so tests can replay the exact trajectory in
    numpy.
    """
    spark = df.sparkSession
    # localCheckpoint: every round re-reads the prepared vectors; without
    # it each iteration replays the scan+cast lineage and the plan grows
    d = (
        fan_out(df)
        .select(F.col(id_col), as_double(vec_col).alias("e"))
        .localCheckpoint(eager=False)
    )
    first_row = d.select("e").first()
    if first_row is None:
        # empty corpus: no model to fit — a well-typed empty result, not
        # a crash (the empty-slice contract of test_empty_inputs)
        id_type = dict(df.dtypes)[id_col]
        return spark.createDataFrame(
            [], f"{id_col} {id_type}, cluster int, sqdist double"
        )
    if dim is None:
        dim = len(first_row["e"])
    cents: list[list[float]] = [
        # first k BY id — filter(id < k) would seed nothing on sparse ids
        list(r["e"]) for r in d.orderBy(id_col).limit(k).collect()
    ]

    def assign(centroids: list[list[float]]) -> DataFrame:
        cdf = spark.createDataFrame(
            [(i, v) for i, v in enumerate(centroids)],
            "cluster int, ce array<double>",
        )
        # argmin via min(struct) — partial-aggregable, no sort, and the
        # ×k broadcast expansion collapses map-side; see ivf_topk
        return (
            d.crossJoin(F.broadcast(cdf))
            .withColumn("sqd", F.expr(SQDIST.format(a="e", b="ce")))
            .groupBy(id_col)
            .agg(
                F.min(
                    F.struct(
                        F.col("sqd").alias("sqd"),
                        F.col("cluster").alias("cluster"),
                        F.col("e").alias("e"),
                    )
                ).alias("best")
            )
            .select(id_col, F.col("best.e").alias("e"),
                    F.col("best.cluster").alias("cluster"),
                    F.col("best.sqd").alias("sqd"))
        )

    for _ in range(max_iterations):
        # update step via posexplode: shuffle is rows×dim (cluster, pos)
        # cells with map-side partial avg — no dim-wide codegen, so cost
        # scales to 4096-dim embeddings unchanged
        new_rows = (
            assign(cents)
            .select("cluster", F.posexplode("e").alias("pos", "v"))
            .groupBy("cluster", "pos")
            .agg(F.avg("v").alias("m"))
            .collect()
        )
        new_cents = [list(c) for c in cents]
        for r in new_rows:  # empty clusters keep their previous centroid
            new_cents[r["cluster"]][r["pos"]] = r["m"]
        if new_cents == cents:
            break
        cents = new_cents

    return assign(cents).select(
        id_col, "cluster", F.round("sqd", 6).alias("sqdist")
    )


def mmr_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    k: int = 5,
    pool: int = 20,
    lam: float = 0.5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Maximal-marginal-relevance top-k: diversified neighbors.

    Plain cosine top-k returns near-duplicates of each other; MMR
    greedily picks the candidate maximizing
    ``lam * sim(query, c) - (1 - lam) * max_{s in selected} sim(c, s)``
    so results cover the neighborhood instead of piling on one mode.

    Distributed shape: stage 1 is the existing :func:`cosine_topk`
    scan for a per-query candidate POOL (size ``pool`` — the only
    stage that touches the corpus); stage 2 re-joins the pool ids to
    their vectors and runs the O(pool² · k) greedy selection per query
    inside ``applyInPandas`` — per-task state is one query's pool,
    never the corpus.  Deterministic: ties break on neighbor id.

    Cross-engine determinism: the greedy compares similarities rounded
    to 6 decimals (``rel`` reuses the pool's already-rounded cosine;
    pairwise sims are rounded the same way), so an oracle that computes
    the dots in a different summation order reaches identical argmax
    picks — the same discipline :func:`cosine_topk` applies before its
    rank.  The selection itself is a per-query recursive CTE in the
    ss07 oracle, like et16's LTTB replay.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import (
        DoubleType,
        IntegerType,
        StructField,
        StructType,
    )

    pool_df = cosine_topk(corpus, queries, k=pool, id_col=id_col, vec_col=vec_col)
    vecs = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.expr(f"transform({vec_col}, x -> cast(x as double))").alias("nvec"),
    )
    qvecs = queries.select(
        F.col(id_col).alias("query_id"),
        F.expr(f"transform({vec_col}, x -> cast(x as double))").alias("qvec"),
    )
    pool_v = pool_df.join(vecs, "neighbor_id").join(qvecs, "query_id")

    # id columns typed after the actual id_col — a hardcoded LongType
    # would crash the Arrow serializer for string/uuid ids
    id_type = corpus.schema[id_col].dataType
    out_schema = StructType(
        [
            StructField("query_id", id_type),
            StructField("neighbor_id", id_type),
            StructField("rank", IntegerType()),
            StructField("mmr_score", DoubleType()),
        ]
    )

    def select(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("neighbor_id", kind="mergesort")
        ids = pdf["neighbor_id"].to_numpy()
        V = np.stack(pdf["nvec"].to_numpy())
        Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
        # sim(query, candidate): the pool's cosine, already rounded to 6dp
        # by cosine_topk — identical to what any oracle engine computes
        rel = pdf["cosine"].to_numpy(dtype=np.float64)
        # sim(candidate, candidate), rounded the same way
        inter = np.round(Vn @ Vn.T, 6)
        chosen: list[int] = []
        scores: list[float] = []
        avail = np.ones(len(ids), dtype=bool)
        for _ in range(min(k, len(ids))):
            if chosen:
                penalty = inter[:, chosen].max(axis=1)
            else:
                penalty = np.zeros(len(ids))
            mmr = lam * rel - (1 - lam) * penalty
            mmr[~avail] = -np.inf
            best = int(np.argmax(mmr))     # first max = lowest id on ties
            chosen.append(best)
            scores.append(float(mmr[best]))
            avail[best] = False
        return pd.DataFrame(
            {
                "query_id": pdf["query_id"].iloc[0],
                "neighbor_id": ids[chosen],
                "rank": np.arange(1, len(chosen) + 1, dtype="int32"),
                # NOT re-rounded: 0.5*(rel - pen) on 6dp-rounded inputs lands
                # exactly on half-boundaries, where numpy (half-even) and SQL
                # engines (half-away) disagree; the unrounded doubles are
                # already bit-identical across engines.
                "mmr_score": np.asarray(scores, dtype=np.float64),
            }
        )

    return pool_v.groupBy("query_id").applyInPandas(select, schema=out_schema)


def _pq_parts(
    corpus: DataFrame, *, m: int, ks: int, id_col: str, vec_col: str
) -> tuple[DataFrame, DataFrame, int]:
    """Shared PQ prep: (prepared vectors, codebook, subdim).

    The codebook is deterministic — for each of the ``m`` subspaces, the
    ``ks`` sub-vectors sliced from the first ``ks`` corpus rows by id
    (same seeding convention as :func:`ivf_topk`; a production index
    trains per-subspace centroids with k-means and the plans below are
    unchanged).  Codebook size is m·ks rows of subdim doubles — broadcast
    state, like kmeans' centroid matrix.
    """
    d = _normed(corpus, id_col=id_col, vec_col=vec_col).select(id_col, "e")
    id_type = dict(corpus.dtypes)[id_col]
    cb_schema = f"sub int, code {id_type}, cvec array<double>"
    # ONE bounded collect (ks rows) covers the dim probe AND the
    # codebook: before, a separate first() job probed the dim and the
    # two codebook broadcasts (encode side + query-LUT side) each
    # replayed the corpus scan + TakeOrdered.  The sub-vector slicing
    # happens in the driver over ks·m tiny lists — the codebook becomes
    # a LocalRelation plan literal (the _seed_local rationale).  Picked
    # from the UNFANNED corpus so the collect is a shuffle-free
    # TakeOrderedAndProject (see _seed_local).
    seed_rows = (
        corpus.select(F.col(id_col), as_double(vec_col).alias("e"))
        .orderBy(id_col)
        .limit(ks)
        .collect()
    )
    if not seed_rows:
        # empty corpus: empty codebook with the right schema — every
        # downstream join/encode/search then yields a typed empty result
        return d, corpus.sparkSession.createDataFrame([], cb_schema), 1
    dim = len(seed_rows[0]["e"])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    sd = dim // m
    cb_rows = [
        (sub, r[id_col],
         None if r["e"] is None else list(r["e"][sub * sd:(sub + 1) * sd]))
        for r in seed_rows
        for sub in range(m)
    ]
    codebook = corpus.sparkSession.createDataFrame(cb_rows, cb_schema)
    return d, codebook, sd


def _sqd_micro(a: str, b: str) -> Column:
    """Squared L2 distance in integer micro-units (≈6dp).

    Integer distances make every downstream SUM and argmin
    order-independent and therefore bit-identical across engines —
    float partial-distance sums would drift with aggregation order.
    """
    sqd = SQDIST.format(a=a, b=b)
    return F.round(F.expr(sqd) * 1e6, 0).cast("long")


def _pq_encode_with(
    d: DataFrame, codebook: DataFrame, sd: int, *, m: int, id_col: str
) -> DataFrame:
    exploded = d.select(
        id_col, F.explode(F.expr(f"sequence(0, {m - 1})")).alias("sub"), "e"
    ).withColumn("sv", F.expr(f"slice(e, sub * {sd} + 1, {sd})"))
    return (
        exploded.join(F.broadcast(codebook), "sub")
        .withColumn("sqd", _sqd_micro("sv", "cvec"))
        .groupBy(id_col, "sub")
        .agg(F.min(F.struct("sqd", "code")).alias("best"))
        .select(id_col, "sub", F.col("best.code").alias("code"))
    )


def pq_encode(
    corpus: DataFrame,
    *,
    m: int = 8,
    ks: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Product-quantization encoding: ``(id, sub, code)`` long form.

    Each vector is split into ``m`` subspaces; each sub-vector is replaced
    by the id of its nearest codebook entry — compressing a 64-dim float
    vector to ``m`` small ints (32× smaller at m=8/ks=16; the reason PQ is
    THE 100 TB embedding-store layout).  Long form is exactly what the
    ADC search join consumes; the compact ``array<int>`` storage form is
    one ``groupBy(id).agg(sort_array(collect_list(...)))`` away.

    Distributed shape: explode to rows×m sub-vectors, equi-join the
    broadcast codebook on ``sub``, argmin per (id, sub) via
    ``min(struct(dist, code))`` — a partial-aggregating groupBy, ONE
    shuffle linear in rows×m, no window, no cross join against data.
    """
    d, codebook, sd = _pq_parts(corpus, m=m, ks=ks, id_col=id_col, vec_col=vec_col)
    return _pq_encode_with(d, codebook, sd, m=m, id_col=id_col)


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    k: int = 3,
    m: int = 8,
    ks: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """PQ asymmetric-distance top-k: the compressed-corpus ANN path.

    The corpus is only ever touched through its PQ codes; per query, a
    lookup table of m·ks partial squared distances (query sub-vector vs
    codebook entry) is broadcast, and each candidate's approximate
    distance is the SUM of m table hits — no corpus vector is read at
    search time.  Returned ``adist_micro`` is that sum in integer
    micro-units (see :func:`_sqd_micro`).

    Distributed shape: codes ⋈ broadcast LUT on (sub, code) — a broadcast
    hash join over the rows×m code table — then a partial-aggregating
    groupBy(query, id) SUM and a per-query top-k window over k·|queries|
    candidates.  Everything is linear in corpus size; the 100 TB knobs
    are m (compression) and ks (fidelity), not the join shape.
    """
    # one shared prep: the encode path and the query LUT both use the
    # same corpus codebook (and its single dim-probe job)
    d, corpus_cb, sd = _pq_parts(corpus, m=m, ks=ks, id_col=id_col, vec_col=vec_col)
    codes = _pq_encode_with(d, corpus_cb, sd, m=m, id_col=id_col)
    q = _normed(queries, id_col=id_col, vec_col=vec_col).select(id_col, "e")
    q_exploded = q.select(
        F.col(id_col).alias("query_id"),
        F.explode(F.expr(f"sequence(0, {m - 1})")).alias("sub"),
        "e",
    ).withColumn("qv", F.expr(f"slice(e, sub * {sd} + 1, {sd})"))
    lut = q_exploded.join(F.broadcast(corpus_cb), "sub").select(
        "query_id", "sub", "code", _sqd_micro("qv", "cvec").alias("pd")
    )
    dist = (
        codes.join(F.broadcast(lut), ["sub", "code"])
        .filter(F.col(id_col) != F.col("query_id"))
        .groupBy("query_id", id_col)
        .agg(F.sum("pd").alias("adist_micro"))
    )
    w = W.partitionBy("query_id").orderBy(F.asc("adist_micro"), F.asc(id_col))
    return (
        dist.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", F.col(id_col).alias("neighbor_id"), "adist_micro")
    )


def _rademacher_sign(i: int, j: int, seed: str = "rp") -> int:
    """Deterministic ±1 from the shared md5-60bit hash — any engine that
    can md5 derives the identical projection matrix."""
    import hashlib

    h = int(hashlib.md5(f"{seed}|{i}|{j}".encode()).hexdigest()[:15], 16)
    return 1 if h % 2 == 0 else -1


def random_project(
    df: DataFrame,
    *,
    out_dim: int = 16,
    in_dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: str = "rp",
) -> DataFrame:
    """Johnson–Lindenstrauss random projection to ``out_dim`` dims,
    long-form ``(id, j, proj_micro)`` — the ANN pre-processing step that
    shrinks embedding storage/compute before LSH or PQ indexing, with
    pairwise distances preserved to ~1/sqrt(out_dim) relative error
    (Achlioptas 2003: Rademacher ±1 entries suffice).

    Determinism: inputs integerize to micro units first, and ±1 signs
    keep every output an exact INTEGER sum — bit-identical in any
    engine and any aggregation order (the pq_topk discipline).  The
    projection matrix is md5-derived from ``seed``, never stored.

    Distributed shape: the whole operator is one row-local projection —
    ``out_dim`` codegen'd sums of ±x[i] with NO shuffle and NO UDF; at
    100 TB it runs at scan speed.  (Callers wanting unit-scale floats
    divide by 1e6·sqrt(out_dim) downstream.)
    """
    x = (
        fan_out(df)
        .select(
            F.col(id_col),
            F.expr(
                f"transform({vec_col}, v -> cast(round(cast(v as double) * 1e6, 0) as bigint))"
            ).alias("x"),
        )
    )
    projs = []
    for j in range(out_dim):
        terms = " + ".join(
            f"({_rademacher_sign(i, j, seed)} * x[{i}])" for i in range(in_dim)
        )
        projs.append(F.expr(terms).alias(f"p{j}"))
    wide = x.select(id_col, *projs)
    return wide.select(
        id_col,
        F.posexplode(F.array(*[f"p{j}" for j in range(out_dim)])).alias(
            "j", "proj_micro"
        ),
    )


def semantic_dedup(
    corpus: DataFrame,
    *,
    n_clusters: int = 16,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
) -> DataFrame:
    """Semantic deduplication (SemDeDup, Abbas et al. 2023): cluster the
    embedding space, then inside each cluster drop every item that has an
    earlier (lower-id) neighbor at cosine ≥ ``threshold``.

    Complements the lexical family: MinHash/SimHash catch copies of the
    same TEXT; this catches semantically redundant rephrasings that share
    no n-grams.  Returns one row per input — ``(id, cluster, kept)`` — so
    callers can either filter ``kept`` or audit the drop rate per cluster.

    Distributed shape: assignment is the IVF plan (broadcast the
    ``n_clusters`` seed centroids against one corpus scan, argmin via a
    per-row window — no shuffle of the corpus); the candidate pair step is
    an EQUI-join on the cluster id, never an all-pairs cross join.  The
    within-cluster work is quadratic in cluster size only — at 100 TB you
    raise ``n_clusters`` ~ sqrt(n) (the paper runs 50k clusters for
    LAION-scale corpora) so per-cluster membership stays bounded, and the
    equi-join shuffle stays linear in the corpus.  Seeding is the first
    ``n_clusters`` vectors by id — deterministic and oracle-replayable;
    a production index would train seeds with :func:`kmeans_lloyd` and
    the rest of the plan is unchanged.
    """
    c = _normed(corpus, id_col=id_col, vec_col=vec_col)
    # first n_clusters BY id — see ivf_topk seeding note.  NOT
    # _seed_local here: unlike ivf_topk/pq (two consumers each), this
    # operator broadcasts the seeds exactly ONCE, so the lazy subtree
    # costs the same single corpus pass and overlaps with the assign
    # scan — localizing it measurably lost 0.35 s on dd12 at sf0.1 for
    # zero scans saved.
    cents = c.orderBy(id_col).limit(n_clusters).select(
        F.col(id_col).alias("cent_id"), F.col("e").alias("ce"), F.col("nrm").alias("cn")
    )
    sim = F.round(
        F.expr(DOT.format(a="e", b="ce")) / (F.col("nrm") * F.col("cn")), round_to
    )
    # argmin via min(struct) — partial-aggregable, no sort; see ivf_topk
    assign = (
        c.crossJoin(F.broadcast(cents))
        .withColumn("sim", sim)
        .groupBy(id_col)
        .agg(
            F.min(
                F.struct(
                    (-F.col("sim")).alias("negsim"),
                    F.col("cent_id").alias("cent_id"),
                    F.col("e").alias("e"),
                    F.col("nrm").alias("nrm"),
                )
            ).alias("best")
        )
        .select(F.col(id_col), F.col("best.e").alias("e"),
                F.col("best.nrm").alias("nrm"), F.col("best.cent_id").alias("cluster"))
        # three consumers below (both pair sides + the final labeling
        # join) would each replay the scan+assignment lineage;
        # materialize it once — the kmeans_lloyd discipline
        .localCheckpoint(eager=False)
    )
    a = assign.select(
        F.col("cluster"),
        F.col(id_col).alias("id_a"),
        F.col("e").alias("ea"),
        F.col("nrm").alias("na"),
    )
    b = assign.select(
        F.col("cluster"),
        F.col(id_col).alias("id_b"),
        F.col("e").alias("eb"),
        F.col("nrm").alias("nb"),
    )
    cos = F.round(F.expr(DOT.format(a="ea", b="eb")) / (F.col("na") * F.col("nb")), round_to)
    dropped = (
        a.join(b, ["cluster"])
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", cos)
        .filter(F.col("cosine") >= threshold)
        .select(F.col("id_b").alias(id_col))
        .distinct()
    )
    return (
        assign.join(dropped.withColumn("is_dup", F.lit(True)), id_col, "left")
        .select(
            id_col,
            "cluster",
            F.coalesce(~F.col("is_dup"), F.lit(True)).alias("kept"),
        )
    )
