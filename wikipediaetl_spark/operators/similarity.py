"""Similarity search over the ``embeddings`` table (SURVEY.md §2.11).

Brute-force cosine top-k as the exact baseline, plus two scale paths:
IVF (coarse-quantizer cluster pruning, centroids via an applyInPandas
aggregation — the engine's pandas-UDAF axis) and random-hyperplane LSH
bucketing. The reference plans but never implements analysis beyond ETL
(README.md:22-24); these operators are the [E] extensions BASELINE.json
mandates for LLM-data pipelines.

Scale posture: query sets are broadcast against a single pass over the
corpus (never corpus×corpus); candidate generation shuffles on bucket keys;
exact re-scoring runs only on candidates.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from wikipediaetl_spark.catalog import query
from wikipediaetl_spark.sources import load_table


def dot_expr(a: Column, b: Column) -> Column:
    """Σ aᵢbᵢ as a native fold — JVM-side, no UDF."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def cosine_expr(a: Column, b: Column) -> Column:
    """Cosine similarity from native array expressions (arrays pre-cast to
    double so the fold is a sequential double accumulation — bit-comparable
    with the DuckDB oracle's list_dot_product)."""
    return dot_expr(a, b) / (F.sqrt(dot_expr(a, a)) * F.sqrt(dot_expr(b, b)))


def _vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vectors with the L2 norm precomputed once — every similarity
    query divides by norms, so computing them per candidate pair would fold
    each vector O(k) extra times."""
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v"), "label"
    )
    return e.withColumn("v_norm", F.sqrt(dot_expr(F.col("v"), F.col("v"))))


@query(
    "q57_cosine_topk",
    oracle="""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    q AS (SELECT vec_id, v FROM e WHERE vec_id < 10),
    scored AS (
      SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
             round(list_dot_product(q.v, e.v)
                   / (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(e.v, e.v))),
                   6) AS cos_sim
      FROM q JOIN e ON q.vec_id <> e.vec_id
    )
    SELECT query_id, neighbor_id, cos_sim, CAST(rnk AS BIGINT) AS rnk
    FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cos_sim DESC, neighbor_id ASC) AS rnk
      FROM scored
    ) WHERE rnk <= 5
    """,
)
def q57_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact brute-force cosine top-5 neighbors for query vectors vec_id<10.

    The baseline ANN oracle: broadcast the 10 query vectors, one pass over
    the corpus scoring all pairs, per-query top-k via window. At 100 TB the
    corpus side streams partition-parallel and only k rows per query survive
    the rank filter (WindowGroupLimit pushes the limit pre-shuffle).
    Ranking uses the *rounded* similarity + neighbor_id tiebreak so order is
    reproducible across float reassociation.
    """
    e = _vectors(spark, sf_dir)
    q = e.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("v_norm").alias("q_norm"),
    )
    cos = F.round(
        dot_expr(F.col("qv"), F.col("v")) / (F.col("q_norm") * F.col("v_norm")), 6
    )
    scored = (
        F.broadcast(q)
        .join(e, F.col("query_id") != F.col("vec_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"), cos.alias("cos_sim"))
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= 5)
        .select("query_id", "neighbor_id", "cos_sim", "rnk")
    )


# ------------------------------------------------------------------ IVF


def ivf_centroids(vectors: DataFrame, dim: int = 64) -> DataFrame:
    """Per-label centroids via applyInPandas — the engine's pandas-UDAF.

    Grouped Arrow batches in, one centroid row out per group (SURVEY.md
    §2.10 [E]). At scale this is a single shuffle on the cluster key with
    numpy doing the per-group reduction."""

    def centroid(pdf: pd.DataFrame) -> pd.DataFrame:
        mat = np.stack(pdf["v"].to_numpy())
        c = mat.mean(axis=0)
        c = c / np.linalg.norm(c)
        return pd.DataFrame({"label": [int(pdf["label"].iloc[0])], "centroid": [c.tolist()]})

    return vectors.groupBy("label").applyInPandas(
        centroid, schema="label int, centroid array<double>"
    )


@query("q58_ivf_ann")
def q58_ivf_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: probe the 3 nearest coarse cells, exact-score inside.

    centroids (applyInPandas UDAF) → assign each query to its top-3 cells →
    score only vectors in those cells → top-5 per query. Rows-only check
    (float centroid accumulation is not SQL-oracle-reproducible); tests
    measure recall against q57's exact top-k.
    """
    e = _vectors(spark, sf_dir)
    cents = ivf_centroids(e)
    q = e.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    # query → 3 nearest centroids
    qc = (
        F.broadcast(q)
        .crossJoin(F.broadcast(cents))
        .select(
            "query_id",
            "qv",
            "label",
            F.round(cosine_expr(F.col("qv"), F.col("centroid")), 6).alias("c_sim"),
        )
    )
    wq = W.partitionBy("query_id").orderBy(F.col("c_sim").desc(), F.col("label").asc())
    probes = qc.withColumn("rn", F.row_number().over(wq)).filter(F.col("rn") <= 3).select(
        "query_id", "qv", "label"
    )
    scored = (
        F.broadcast(probes)
        .join(e, "label")
        .filter(F.col("query_id") != F.col("vec_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(cosine_expr(F.col("qv"), F.col("v")), 6).alias("cos_sim"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= 5)
        .select("query_id", "neighbor_id", "cos_sim", "rnk")
    )


@query(
    "q163_ivf_ann_oracle",
    oracle="""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v, label FROM embeddings),
    c AS (
      SELECT label, v AS centroid FROM e
      QUALIFY row_number() OVER (PARTITION BY label ORDER BY vec_id ASC) = 1
    ),
    q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 10),
    probes AS (
      SELECT query_id, qv, label FROM (
        SELECT q.query_id, q.qv, c.label,
               row_number() OVER (
                 PARTITION BY q.query_id
                 ORDER BY round(list_dot_product(q.qv, c.centroid)
                   / (sqrt(list_dot_product(q.qv, q.qv))
                      * sqrt(list_dot_product(c.centroid, c.centroid))), 6) DESC,
                 c.label ASC) AS rn
        FROM q CROSS JOIN c
      ) WHERE rn <= 3
    ),
    scored AS (
      SELECT p.query_id, e.vec_id AS neighbor_id,
             round(list_dot_product(p.qv, e.v)
               / (sqrt(list_dot_product(p.qv, p.qv))
                  * sqrt(list_dot_product(e.v, e.v))), 6) AS cos_sim
      FROM probes p JOIN e ON p.label = e.label AND p.query_id <> e.vec_id
    )
    SELECT query_id, neighbor_id, cos_sim, CAST(rnk AS BIGINT) AS rnk
    FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cos_sim DESC, neighbor_id ASC) AS rnk
      FROM scored
    ) WHERE rnk <= 5
    """,
)
def q163_ivf_ann_oracle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-checked IVF probe (VERDICT r3 #7): identical cell-probe
    topology to q58 — rank coarse cells, probe the top 3, exact-score only
    inside probed cells, top-5 per query — but the coarse quantizer is the
    MEDOID SEED (each label's minimum-vec_id vector) instead of a float
    mean, so centroids involve no data-order-dependent accumulation and the
    whole pipeline is reproducible in ANSI SQL. Every similarity is rounded
    to 6 places before ranking (q57's reassociation guard), which lets the
    driver hash-verify an ANN path end-to-end rather than rows-only. Scale
    shape is q58's: centroid table is tiny and broadcast twice (probe
    ranking, then candidate join); the corpus is touched once, filtered to
    probed cells before any scoring."""
    e = _vectors(spark, sf_dir)
    wc = W.partitionBy("label").orderBy(F.col("vec_id").asc())
    cents = (
        e.withColumn("rn", F.row_number().over(wc))
        .filter(F.col("rn") == 1)
        .select("label", F.col("v").alias("centroid"))
    )
    q = e.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    c_sim = F.round(
        dot_expr(F.col("qv"), F.col("centroid"))
        / (
            F.sqrt(dot_expr(F.col("qv"), F.col("qv")))
            * F.sqrt(dot_expr(F.col("centroid"), F.col("centroid")))
        ),
        6,
    )
    wq = W.partitionBy("query_id").orderBy(F.col("c_sim").desc(), F.col("label").asc())
    probes = (
        F.broadcast(q)
        .crossJoin(F.broadcast(cents))
        .select("query_id", "qv", "label", c_sim.alias("c_sim"))
        .withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= 3)
        .select("query_id", "qv", "label")
    )
    cos = F.round(
        dot_expr(F.col("qv"), F.col("v"))
        / (
            F.sqrt(dot_expr(F.col("qv"), F.col("qv")))
            * F.sqrt(dot_expr(F.col("v"), F.col("v")))
        ),
        6,
    )
    scored = (
        F.broadcast(probes)
        .join(e, "label")
        .filter(F.col("query_id") != F.col("vec_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"), cos.alias("cos_sim"))
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= 5)
        .select("query_id", "neighbor_id", "cos_sim", "rnk")
    )


# ------------------------------------------------------------------ LSH


def hyperplane_signs(v: Column, n_planes: int, dim: int, seed: int = 7) -> Column:
    """Random-hyperplane LSH bucket key from native exprs: plane p's weights
    are deterministic pseudo-randoms derived from xxhash64(seed, p, i); the
    sign bits pack into one long bucket id. No stored plane matrix — the
    hyperplanes are recomputed in-expression, so the operator is stateless
    and cluster-reproducible."""
    bits = []
    for p in range(n_planes):
        # deterministic ±1 weights per dimension via hash parity
        terms = F.aggregate(
            F.zip_with(
                v,
                F.transform(
                    F.sequence(F.lit(0), F.lit(dim - 1)),
                    lambda i: (
                        F.when(
                            F.pmod(F.xxhash64(F.lit(seed), F.lit(p), i), F.lit(2)) == 0, 1.0
                        ).otherwise(-1.0)
                    ),
                ),
                lambda x, w: x * w,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bits.append(F.when(terms > 0, F.lit(1).cast("long") * (1 << p)).otherwise(0))
    return sum(bits)


def lsh_bucket_union(
    vectors: DataFrame,
    n_tables: int,
    bits: int,
    dim: int,
    seed: int = 7,
) -> DataFrame:
    """Multi-table Gaussian-hyperplane LSH buckets: ``vectors(vec_id, v)`` →
    one row per (vec_id, tbl, bucket).

    The plane matrix (n_tables × bits hyperplanes) is seeded-deterministic
    (same buckets on every run/executor); all signatures for an Arrow batch
    come from ONE numpy matmul (q91's BLAS pattern), so the per-vector cost
    is O(tables · bits · dim / SIMD) — not tables × bits separate folds.

    Recall amplification: a pair at angle θ collides in one table with
    p = (1 - θ/π)^bits and is a candidate with 1 - (1 - p)^n_tables. The
    union over tables buys recall; the prune factor grows steeply with the
    similarity threshold (near-dup regimes ≥0.9 prune ~1000×) and collapses
    toward 1 as the threshold drops — for loose thresholds use coarse
    blocking (q58 IVF / q131 label blocking) instead.
    """
    from collections.abc import Iterator

    rng = np.random.RandomState(seed)
    planes = rng.randn(n_tables * bits, dim)
    weights = 1 << np.arange(bits)

    def sig(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.stack(pdf["v"].to_numpy())
            signs = (mat @ planes.T) > 0  # (n, n_tables*bits)
            buckets = signs.reshape(len(pdf), n_tables, bits) @ weights  # (n, T)
            yield pd.DataFrame(
                {
                    "vec_id": np.repeat(pdf["vec_id"].to_numpy(), n_tables),
                    "tbl": np.tile(np.arange(n_tables), len(pdf)),
                    "bucket": buckets.reshape(-1),
                }
            )

    return vectors.select("vec_id", "v").mapInPandas(
        sig, schema="vec_id long, tbl int, bucket long"
    )


def lsh_candidate_pairs_union(
    vectors: DataFrame,
    n_tables: int,
    bits: int,
    dim: int,
    seed: int = 7,
) -> DataFrame:
    """Distinct candidate pairs (vec_a < vec_b) sharing a bucket in ANY of the
    ``n_tables`` LSH tables. The self-join shuffles on (tbl, bucket) — the
    cross product never materializes in the plan."""
    buckets = lsh_bucket_union(vectors, n_tables, bits, dim, seed)
    a = buckets.select(F.col("vec_id").alias("vec_a"), "tbl", "bucket")
    b = buckets.select(F.col("vec_id").alias("vec_b"), "tbl", "bucket")
    return (
        a.join(b, ["tbl", "bucket"])
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b")
        .distinct()
    )


@query("q59_lsh_ann")
def q59_lsh_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed ANN: 8 signed hyperplanes → bucket join → exact score.

    Scale path for corpus×corpus similarity: candidates only form within a
    bucket (equi-join on the packed sign key), so the shuffle key is the
    bucket id and the cross product never materializes. Rows-only; tests
    check bucket determinism and candidate recall on near-dup pairs.
    """
    e = _vectors(spark, sf_dir).filter(F.col("vec_id") < 500)
    bucketed = e.withColumn("bucket", hyperplane_signs(F.col("v"), n_planes=8, dim=64))
    a = bucketed.select(
        F.col("vec_id").alias("vec_a"), F.col("v").alias("va"), "bucket"
    )
    b = bucketed.select(
        F.col("vec_id").alias("vec_b"), F.col("v").alias("vb"), "bucket"
    )
    return (
        a.join(b, "bucket")
        .filter(F.col("vec_a") < F.col("vec_b"))
        .withColumn("cos_sim", F.round(cosine_expr(F.col("va"), F.col("vb")), 6))
        .filter(F.col("cos_sim") >= 0.3)
        .select("vec_a", "vec_b", "cos_sim")
    )


@query("q91_cosine_topk_blas")
def q91_cosine_topk_blas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-5 via mapInPandas + numpy matmul — the
    vectorized Python path for when per-row expression folds become the
    bottleneck (wide vectors, many queries).

    Each Arrow batch of corpus vectors is scored against the broadcast query
    matrix in one BLAS matmul (O(batch × k × dim) with SIMD), then only the
    per-batch candidates leave Python; the global top-k reduction stays in
    Spark. Rows-only check; tests assert exact agreement with q57's
    expression path.
    """
    from collections.abc import Iterator

    e = _vectors(spark, sf_dir)
    queries = (
        e.filter(F.col("vec_id") < 10)
        .select("vec_id", "v")
        .collect()  # 10 rows — the query set is driver-small by definition
    )
    if not queries:
        return spark.createDataFrame(
            [], "query_id long, neighbor_id long, cos_sim double, rnk long"
        )
    q_ids = [r.vec_id for r in queries]
    q_mat = np.stack([np.array(r.v) for r in queries])
    q_mat = q_mat / np.linalg.norm(q_mat, axis=1, keepdims=True)

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.stack(pdf["v"].to_numpy())
            mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
            sims = mat @ q_mat.T  # (batch, k)
            n = len(pdf)
            yield pd.DataFrame(
                {
                    "query_id": np.repeat(q_ids, n),
                    "neighbor_id": np.tile(pdf["vec_id"].to_numpy(), len(q_ids)),
                    "cos_sim": np.round(sims.T.reshape(-1), 6),
                }
            )

    scored = e.select("vec_id", "v").mapInPandas(
        score, schema="query_id long, neighbor_id long, cos_sim double"
    ).filter(F.col("query_id") != F.col("neighbor_id"))
    w = W.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= 5)
        .select("query_id", "neighbor_id", "cos_sim", "rnk")
    )


# ------------------------------------------------------------------ PQ


def pq_codebooks(sample: np.ndarray, m: int = 8, k: int = 16, iters: int = 10) -> np.ndarray:
    """Deterministic per-subspace Lloyd k-means → codebooks[m, k, dim/m].

    Trained on a BOUNDED sample (FAISS practice: codebooks come from ~1e5
    sampled vectors, never the full corpus), rows pre-sorted by caller so
    init (first k rows) and every argmin tiebreak (np.argmin → lowest
    index) are order-independent and bit-reproducible."""
    n, dim = sample.shape
    d_sub = dim // m
    books = np.empty((m, k, d_sub))
    for s in range(m):
        x = sample[:, s * d_sub : (s + 1) * d_sub]
        cents = x[:k].copy()
        for _ in range(iters):
            # assignment: nearest centroid by L2 (vectors are pre-normalized,
            # so L2-nearest == max-inner-product ranking per subspace)
            d2 = ((x[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for c in range(k):
                mask = assign == c
                if mask.any():
                    cents[c] = x[mask].mean(axis=0)
        books[s] = cents
    return books


@query("q143_pq_ann")
def q143_pq_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN (Jégou et al., "Product Quantization for
    Nearest Neighbor Search", TPAMI 2011): the memory-bound scale path —
    64-dim float vectors compress to m=8 one-byte codes (64× smaller), the
    corpus scan reads codes only, and scoring is m table lookups per vector
    (ADC) instead of a 64-dim dot product.

    Plan: (1) train per-subspace codebooks driver-side on a bounded
    deterministic sample (the only collect; FAISS-style), (2) encode the
    corpus with one mapInPandas pass (vectorized argmin per subspace over
    Arrow batches; at 100 TB this is the pass that writes the 8-byte code
    column once, after which ANN queries never touch raw vectors),
    (3) ADC-score codes against broadcast per-query lookup tables with
    per-partition partial top-k (map-side combine shape: each batch emits ≤
    shortlist rows per query, never n·q rows), (4) exact re-rank of the
    shortlist against true vectors → top-5. Rows-only check (float k-means
    is not SQL-expressible); recall is tested vs q57's exact top-k."""
    from typing import Iterator

    m, k, shortlist = 8, 16, 40
    e = _vectors(spark, sf_dir)
    # pre-normalize so inner product == cosine and PQ L2 ranking aligns
    norm = e.select(
        "vec_id",
        F.transform(F.col("v"), lambda x: x / F.col("v_norm")).alias("nv"),
    )
    sample_rows = (
        norm.filter(F.col("vec_id") % 7 == 0)
        .orderBy("vec_id")
        .limit(2048)
        .collect()
    )
    sample = np.array([r.nv for r in sample_rows])
    if sample.size == 0:  # empty corpus: nothing to train/encode/query
        return spark.createDataFrame(
            [], "query_id long, neighbor_id long, cos_sim double, rnk long"
        )
    if len(sample) < k:  # tiny corpus: pad by cycling rows so init has k seeds
        sample = np.tile(sample, (-(-k // len(sample)), 1))[: max(k, len(sample))]
    books = pq_codebooks(sample, m=m, k=k)
    d_sub = sample.shape[1] // m
    sc = spark.sparkContext
    b_books = sc.broadcast(books)

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bks = b_books.value
        for pdf in batches:
            mat = np.stack(pdf["nv"].to_numpy())
            codes = np.empty((len(pdf), m), dtype=np.int32)
            for s in range(m):
                x = mat[:, s * d_sub : (s + 1) * d_sub]
                d2 = ((x[:, None, :] - bks[s][None, :, :]) ** 2).sum(axis=2)
                codes[:, s] = d2.argmin(axis=1)
            yield pd.DataFrame({"vec_id": pdf["vec_id"], "codes": list(codes)})

    codes = norm.mapInPandas(encode, schema="vec_id long, codes array<int>")

    queries = sorted(
        (r.vec_id, np.array(r.nv)) for r in norm.filter(F.col("vec_id") < 10).collect()
    )
    # per-query ADC lookup tables: lut[q, s, c] = <q_sub, centroid_sc>
    lut = np.array(
        [
            [[qv[s * d_sub : (s + 1) * d_sub] @ books[s][c] for c in range(k)] for s in range(m)]
            for _, qv in queries
        ]
    )
    qids = np.array([qid for qid, _ in queries])
    b_lut, b_qids = sc.broadcast(lut), sc.broadcast(qids)

    def adc_topk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        tables, ids = b_lut.value, b_qids.value
        for pdf in batches:
            cd = np.stack(pdf["codes"].to_numpy())  # [n, m]
            vec_ids = pdf["vec_id"].to_numpy()
            # scores[q, n] = Σ_s lut[q, s, cd[n, s]]
            scores = tables[:, np.arange(m), cd].sum(axis=2)  # [q, n, m] → [q, n]
            top = min(len(vec_ids), shortlist)
            out_q, out_n, out_s = [], [], []
            for qi in range(len(ids)):
                idx = np.argpartition(-scores[qi], top - 1)[:top]
                out_q.extend([ids[qi]] * len(idx))
                out_n.extend(vec_ids[idx])
                out_s.extend(scores[qi][idx])
            yield pd.DataFrame(
                {"query_id": out_q, "neighbor_id": out_n, "approx_sim": out_s}
            )

    cand = codes.mapInPandas(
        adc_topk, schema="query_id long, neighbor_id long, approx_sim double"
    )
    wq = W.partitionBy("query_id").orderBy(
        F.col("approx_sim").desc(), F.col("neighbor_id").asc()
    )
    short = (
        cand.filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= shortlist)
        .select("query_id", "neighbor_id")
    )
    # exact re-rank of the shortlist against true vectors
    q = e.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("v_norm").alias("q_norm"),
    )
    scored = (
        short.join(e, short["neighbor_id"] == e["vec_id"])
        .join(F.broadcast(q), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                dot_expr(F.col("qv"), F.col("v")) / (F.col("q_norm") * F.col("v_norm")),
                6,
            ).alias("cos_sim"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= 5)
        .select("query_id", "neighbor_id", "cos_sim", "rnk")
    )


# ------------------------------------------------- maintained IVF cell index


def ivf_index_probe(probes: DataFrame, idx: DataFrame, k: int = 5) -> DataFrame:
    """q177's probe plan, factored for plan-assertion (the q174/q175
    pattern): the query batch broadcasts onto the cell-PARTITIONED index —
    the scan reads only the probed cells' directories (static partition
    pruning from the bounded `isin`), the join is broadcast (no shuffle of
    the index side ever), and exact scoring touches only candidate rows."""
    cos = F.round(cosine_expr(F.col("qv"), F.col("v")), 6)
    scored = (
        F.broadcast(probes)
        .join(idx, "cell")
        .filter(F.col("query_id") != F.col("vec_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"), cos.alias("cos_sim"))
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rnk")
    )


def _ivf_assign(df: DataFrame, cents: DataFrame) -> DataFrame:
    """Assign (vec_id, v) rows to their nearest quantizer cell — O(rows × k)
    with the k-row centroid table broadcast; the shared quantize path of
    the batch build and the streaming sink."""
    a_sim = F.round(cosine_expr(F.col("v"), F.col("centroid")), 6)
    wa = W.partitionBy("vec_id").orderBy(F.col("a_sim").desc(), F.col("cell").asc())
    return (
        df.crossJoin(F.broadcast(cents))
        .select("vec_id", "v", a_sim.alias("a_sim"), "cell")
        .withColumn("rn", F.row_number().over(wa))
        .filter(F.col("rn") == 1)
        .select("vec_id", "v", "cell")
    )


def build_ivf_index(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    """q177's maintained-index build, factored so q187 serves the hybrid
    query from the SAME layout: frozen medoid quantizer from the 90% base
    split (deterministic, SQL-reproducible), cell-partitioned bootstrap
    write, then the 10% batch assigned through the same broadcast quantizer
    and APPENDED — no rewrite of history. Both steps go through
    ``append_batch_to_layout`` (partition-only form), so the layout carries
    the replay watermark the streaming sink (``ivf_index_sink``) relies
    on. Returns the (cell, centroid) quantizer table for probe-side cell
    selection."""
    from wikipediaetl_spark.operators.layout import _drop_table, append_batch_to_layout

    e = _vectors(spark, sf_dir)
    is_batch = F.pmod(F.col("vec_id") * 31 + 7, F.lit(10)) == 3
    base = e.filter(~is_batch)
    wc = W.partitionBy("label").orderBy(F.col("vec_id").asc())
    cents = (
        base.withColumn("rn", F.row_number().over(wc))
        .filter(F.col("rn") == 1)
        .select(F.col("label").alias("cell"), F.col("v").alias("centroid"))
    )
    _drop_table(spark, table)
    _drop_table(spark, f"{table}_staging")
    append_batch_to_layout(
        spark, _ivf_assign(base, cents), table, partition_cols=("cell",), batch_id=0
    )
    append_batch_to_layout(
        spark,
        _ivf_assign(e.filter(is_batch), cents),
        table,
        partition_cols=("cell",),
        batch_id=1,
    )
    return cents


def ivf_index_sink(spark: SparkSession, table: str, cents: DataFrame):
    """Streaming maintenance for the IVF cell index (VERDICT r9 #5 — the
    q184 foreachBatch discipline extended to q177's layout):
    ``vectors.writeStream.foreachBatch(ivf_index_sink(spark, table,
    cents))`` quantizes each micro-batch of (vec_id, embedding) rows
    against the FROZEN broadcast centroid table and appends into the
    cell-partitioned index with the micro-batch id as the replay watermark.
    Assignment is per-row and the layout append-only, so the final index is
    invariant to stream batching (asserted by the streaming test); replays
    no-op and mid-append crashes scrub via ``append_batch_to_layout``'s
    protocol. The quantizer itself never changes online — real IVF systems
    re-train offline and rebuild, exactly q177's contract. Delegates the
    recover→apply shape to ``maintained_layout_sink`` (VERDICT r10 #4);
    the recover entry carries the cell partition spec so a recovery rename
    re-registers partitions before any read."""
    from wikipediaetl_spark.operators.layout import (
        append_batch_to_layout,
        maintained_layout_sink,
    )

    def apply_batch(batch: DataFrame, batch_id: int) -> None:
        vecs = batch.select(
            "vec_id", F.col("embedding").cast("array<double>").alias("v")
        )
        append_batch_to_layout(
            spark,
            _ivf_assign(vecs, cents),
            table,
            partition_cols=("cell",),
            batch_id=batch_id,
        )

    return maintained_layout_sink(
        spark, apply_batch, recover_tables=[(table, ("cell",))]
    )


@query(
    "q177_ivf_index_maintenance",
    oracle="""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v, label FROM embeddings),
    base AS (SELECT * FROM e WHERE (vec_id * 31 + 7) % 10 <> 3),
    c AS (
      SELECT label AS cell, v AS centroid FROM base
      QUALIFY row_number() OVER (PARTITION BY label ORDER BY vec_id ASC) = 1
    ),
    assigned AS (
      SELECT vec_id, v, cell FROM (
        SELECT e.vec_id, e.v, c.cell,
               row_number() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY round(list_dot_product(e.v, c.centroid)
                   / (sqrt(list_dot_product(e.v, e.v))
                      * sqrt(list_dot_product(c.centroid, c.centroid))), 6) DESC,
                 c.cell ASC) AS rn
        FROM e CROSS JOIN c
      ) WHERE rn = 1
    ),
    q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 10),
    probes AS (
      SELECT query_id, qv, cell FROM (
        SELECT q.query_id, q.qv, c.cell,
               row_number() OVER (
                 PARTITION BY q.query_id
                 ORDER BY round(list_dot_product(q.qv, c.centroid)
                   / (sqrt(list_dot_product(q.qv, q.qv))
                      * sqrt(list_dot_product(c.centroid, c.centroid))), 6) DESC,
                 c.cell ASC) AS rn
        FROM q CROSS JOIN c
      ) WHERE rn <= 3
    ),
    scored AS (
      SELECT p.query_id, a.vec_id AS neighbor_id,
             round(list_dot_product(p.qv, a.v)
               / (sqrt(list_dot_product(p.qv, p.qv))
                  * sqrt(list_dot_product(a.v, a.v))), 6) AS cos_sim
      FROM probes p JOIN assigned a ON p.cell = a.cell AND p.query_id <> a.vec_id
    )
    SELECT query_id, neighbor_id, cos_sim, CAST(rnk AS BIGINT) AS rnk
    FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cos_sim DESC, neighbor_id ASC) AS rnk
      FROM scored
    ) WHERE rnk <= 5
    """,
)
def q177_ivf_index_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incrementally-MAINTAINED IVF ANN index — the q174 discipline (append-
    only index maintenance under ingest) applied to the embedding family. A
    100 TB vector store cannot re-cluster per batch; the IVF layout is
    maintained instead: the coarse quantizer is FROZEN from the base corpus
    (q163's medoid seeds — deterministic, SQL-reproducible), each ingest
    batch is assigned to its nearest cell in O(batch × k) with the k-row
    centroid table broadcast, and new vectors APPEND into the cell-
    partitioned index — no rewrite of history, no re-assignment of existing
    rows (real IVF systems re-train the quantizer offline and rebuild; the
    online path is exactly this append).

    In-query exercise: embeddings split 90/10 on a deterministic vec_id
    hash; the 90% build the index (saveAsTable PARTITIONED BY cell — each
    cell is a directory, so probes become directory pruning); the 10% batch
    is quantized and appended through the same assignment path. A 10-query
    batch then probes its top-3 cells against the POST-APPEND index: the
    probed cell ids are collected (bounded: ≤ 3 × |queries| ints,
    documented) into a static `isin` partition filter, the index side never
    shuffles (broadcast probe join, plan-asserted via ivf_index_probe), and
    exact cosine runs only inside probed cells. Hash-verified against the
    full-recompute oracle: frozen quantizer + assignment + probe are
    reproduced in ANSI SQL over the whole corpus, and the maintained index
    must return byte-identical top-5s (round-6 sims, q57's reassociation
    guard; all ties broken by cell/neighbor id).

    Note the assignment window: at ingest it runs over O(batch × k) rows
    only — the base-corpus assignment here is the one-time bootstrap a real
    deployment also pays once, not a per-batch cost."""
    from wikipediaetl_spark.operators.layout import _drop_table

    table = "q177_ivf_cell_index"
    cents = build_ivf_index(spark, sf_dir, table)
    e = _vectors(spark, sf_dir)
    q = e.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    c_sim = F.round(cosine_expr(F.col("qv"), F.col("centroid")), 6)
    wq = W.partitionBy("query_id").orderBy(F.col("c_sim").desc(), F.col("cell").asc())
    probes = (
        F.broadcast(q)
        .crossJoin(F.broadcast(cents))
        .select("query_id", "qv", "cell", c_sim.alias("c_sim"))
        .withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= 3)
        .select("query_id", "qv", "cell")
    )
    # bounded collect: ≤ 3 cells per query over a 10-query batch — the probe
    # set IS the serve-time parameter, same class as q57's query list
    cells = [r["cell"] for r in probes.select("cell").distinct().collect()]
    idx = spark.table(table).filter(F.col("cell").isin(cells))
    res = ivf_index_probe(probes, idx).localCheckpoint(eager=True)
    _drop_table(spark, table)
    return res


# ------------------------------------------------------ hybrid retrieval (RRF)


# Shared full-recompute oracle for hybrid retrieval: q182 computes both rank
# lists batch-style, q186 must reproduce the fused answer byte-for-byte with
# the lexical list served from the maintained q179 layouts (the oracle-
# sharing contract of the maintained family).
_Q182_ORACLE = """
    WITH dl AS (
      SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS dl
      FROM documents
    ),
    stats AS (
      SELECT CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(dl) AS BIGINT) AS total_len
      FROM dl
    ),
    tf AS (
      SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
      WHERE tok IN ('hash', 'window', 'spark')
      GROUP BY doc_id, tok
    ),
    df AS (SELECT tok, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY tok),
    per_term AS (
      SELECT tf.doc_id,
             CAST(floor(
               CAST(floor(ln((s.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0)
                          * 1000000 + 0.5) AS BIGINT)
               * (22.0 * tf.tf * s.total_len)
               / (10.0 * tf.tf * s.total_len + 3.0 * s.total_len
                  + 9.0 * dl.dl * s.n_docs)
               + 0.5) AS BIGINT) AS st_u
      FROM tf JOIN df USING (tok) JOIN dl USING (doc_id) CROSS JOIN stats s
    ),
    bm AS (
      SELECT doc_id, CAST(sum(st_u) AS BIGINT) AS score_micro
      FROM per_term GROUP BY doc_id
    ),
    lex AS (
      SELECT doc_id, CAST(rnk AS BIGINT) AS lex_rnk
      FROM (
        SELECT doc_id,
               row_number() OVER (ORDER BY score_micro DESC, doc_id ASC) AS rnk
        FROM bm
      ) WHERE rnk <= 20
    ),
    e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    qv AS (SELECT v FROM e WHERE vec_id = 7),
    sem AS (
      SELECT doc_id, CAST(rnk AS BIGINT) AS sem_rnk
      FROM (
        SELECT e.vec_id AS doc_id,
               row_number() OVER (
                 ORDER BY round(list_dot_product(e.v, q.v)
                   / (sqrt(list_dot_product(e.v, e.v))
                      * sqrt(list_dot_product(q.v, q.v))), 6) DESC,
                 e.vec_id ASC) AS rnk
        FROM e CROSS JOIN qv q WHERE e.vec_id <> 7
      ) WHERE rnk <= 20
    ),
    fused AS (
      SELECT doc_id, lex_rnk, sem_rnk,
             COALESCE(CAST(floor(1000000.0 / (60 + lex_rnk)) AS BIGINT), 0)
             + COALESCE(CAST(floor(1000000.0 / (60 + sem_rnk)) AS BIGINT), 0)
               AS rrf_micro
      FROM lex FULL JOIN sem USING (doc_id)
    )
    SELECT doc_id, rrf_micro, lex_rnk, sem_rnk, CAST(rnk AS BIGINT) AS rnk
    FROM (
      SELECT *, row_number() OVER (ORDER BY rrf_micro DESC, doc_id ASC) AS rnk
      FROM fused
    ) WHERE rnk <= 10
    """


@query("q182_rrf_hybrid_search", oracle=_Q182_ORACLE)
def q182_rrf_hybrid_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval with reciprocal-rank fusion: the BM25 lexical top-20
    (q179's integer micro-nat scoring over the same fixed 3-term query) and
    the embedding cosine top-20 (query vector = doc 7's embedding, q57's
    round-6 + id-tiebreak determinism) fused by RRF —
    score(d) = Σ_lists ⌊10⁶ / (60 + rank_list(d))⌋, the standard k=60 rule —
    and the fused top-10 returned with both source ranks. This is the
    retrieval shape corpus-QA and RAG-audit tooling actually serves: lexical
    recall for rare exact terms, semantic recall for paraphrase, fusion
    robust to either list's score scale because only RANKS cross the
    boundary.

    Exactness: both input lists are already integer-ranked by engine-stable
    keys (BM25 micro-units, round-6 cosine, id tiebreaks), and the RRF
    contribution ⌊10⁶/(60+r)⌋ for r ≤ 20 divides two small exact integers —
    identical floor on both engines — so the fused score is an exact BIGINT
    sum and the final order (score desc, doc_id asc) is deterministic.

    Scale shape: each list is a top-k under a row_number filter
    (WindowGroupLimit prunes per-partition before the single-partition
    rank, the q57/q179 pattern), so only ~k rows per list ever cross a
    shuffle; the fusion is a full-outer join of two ≤20-row lists —
    driver-scale by construction, regardless of corpus size. The doc/vector
    correspondence is positional (doc_id = vec_id), the fixture's contract.
    Reference tie: the planned search/analysis stage the reference never
    built (README.md:24,41)."""
    from wikipediaetl_spark.operators.text_analysis import bm25_index_probe

    d = load_table(spark, sf_dir, "documents")
    # split ONCE (the q179 hoist lesson) — size+explode both reference `w`
    arr = d.select("doc_id", F.split(F.col("text"), " ").alias("w")).localCheckpoint(
        eager=False
    )
    toks = arr.select(
        "doc_id", F.size("w").cast("long").alias("dl"), F.explode("w").alias("tok")
    )
    postings = toks.groupBy("tok", "doc_id", "dl").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )
    doclen = arr.select("doc_id", F.size("w").cast("long").alias("dl"))
    lex = bm25_index_probe(postings, doclen, k=20).select(
        "doc_id", F.col("rnk").alias("lex_rnk")
    )

    return rrf_fuse(lex, semantic_top20(spark, sf_dir))


def semantic_top20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hybrid query's semantic rank list (q57's determinism recipe):
    exact cosine of every corpus vector against doc 7's embedding, top-20
    by (round-6 sim desc, doc_id asc)."""
    e = _vectors(spark, sf_dir)
    qv = e.filter(F.col("vec_id") == 7).select(
        F.col("v").alias("qv"), F.col("v_norm").alias("q_norm")
    )
    cos = F.round(
        dot_expr(F.col("qv"), F.col("v")) / (F.col("q_norm") * F.col("v_norm")), 6
    )
    ws = W.orderBy(F.col("cos_sim").desc(), F.col("doc_id").asc())
    return (
        e.filter(F.col("vec_id") != 7)
        .crossJoin(F.broadcast(qv))
        .select(F.col("vec_id").alias("doc_id"), cos.alias("cos_sim"))
        .withColumn("sem_rnk", F.row_number().over(ws).cast("long"))
        .filter(F.col("sem_rnk") <= 20)
        .select("doc_id", "sem_rnk")
    )


def rrf_fuse(lex: DataFrame, sem: DataFrame) -> DataFrame:
    """Reciprocal-rank fusion of two rank lists (exactness argument in
    q182's docstring): exact integer contributions, full-outer join of two
    ≤20-row lists, deterministic (score desc, doc_id asc) top-10."""

    def contrib(rnk: Column) -> Column:
        return F.coalesce(
            F.floor(F.lit(1000000.0) / (F.lit(60) + rnk)).cast("long"),
            F.lit(0).cast("long"),
        )

    fused = lex.join(sem, "doc_id", "full_outer").select(
        "doc_id",
        "lex_rnk",
        "sem_rnk",
        (contrib(F.col("lex_rnk")) + contrib(F.col("sem_rnk"))).alias("rrf_micro"),
    )
    wf = W.orderBy(F.col("rrf_micro").desc(), F.col("doc_id").asc())
    return (
        fused.withColumn("rnk", F.row_number().over(wf).cast("long"))
        .filter(F.col("rnk") <= 10)
        .select("doc_id", "rrf_micro", "lex_rnk", "sem_rnk", "rnk")
    )


@query("q186_hybrid_index_serving", oracle=_Q182_ORACLE)
def q186_hybrid_index_serving(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval SERVED from the maintained lexical index — the
    capstone of the retrieval family: q182's fused answer with the BM25
    list coming from q179's maintained tok-bucketed postings + doc-grain
    length layouts (bootstrapped from the 90% split and appended with the
    10% batch through the same tokenize path) instead of re-tokenizing the
    corpus per query. The semantic list stays the exact corpus-scan top-20
    (embeddings are doc-grain vectors — one O(docs) pass; the approximate
    cell-probed rung is q177's separate contract), and the fusion is the
    same ≤20-row integer RRF. Must hash-match q182's FULL-RECOMPUTE oracle
    byte-for-byte — retrieval results cannot drift when the serving path
    switches from batch recompute to the maintained index. At 100 TB this
    is the shape a corpus-QA/RAG-audit deployment actually runs: per-query
    cost = bucket-pruned postings probe + O(docs) vector pass + O(k)
    fusion, with O(batch tokens) index maintenance per ingest. Reference
    tie: the planned search/analysis stage the reference never built
    (README.md:24,41)."""
    from wikipediaetl_spark.operators.layout import _drop_table
    from wikipediaetl_spark.operators.text_analysis import (
        bm25_index_probe,
        build_bm25_layouts,
    )

    pt, lt = "q186_bm25_postings", "q186_bm25_doclen"
    build_bm25_layouts(spark, sf_dir, pt, lt)
    lex = bm25_index_probe(spark.table(pt), spark.table(lt), k=20).select(
        "doc_id", F.col("rnk").alias("lex_rnk")
    )
    res = rrf_fuse(lex, semantic_top20(spark, sf_dir)).localCheckpoint(eager=True)
    _drop_table(spark, pt)
    _drop_table(spark, lt)
    return res


# Full-recompute oracle for the IVF-served hybrid: the lexical CTEs are
# q182's verbatim; the semantic list is restricted to the query vector's
# top-3 quantizer cells, with the frozen-medoid assignment reproduced in
# SQL exactly as q177's oracle does — so the maintained, directory-pruned
# serve path must hash-match a declarative restatement of its own pruning.
_Q187_ORACLE = """
    WITH dl AS (
      SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS dl
      FROM documents
    ),
    stats AS (
      SELECT CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(dl) AS BIGINT) AS total_len
      FROM dl
    ),
    tf AS (
      SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
      WHERE tok IN ('hash', 'window', 'spark')
      GROUP BY doc_id, tok
    ),
    df AS (SELECT tok, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY tok),
    per_term AS (
      SELECT tf.doc_id,
             CAST(floor(
               CAST(floor(ln((s.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0)
                          * 1000000 + 0.5) AS BIGINT)
               * (22.0 * tf.tf * s.total_len)
               / (10.0 * tf.tf * s.total_len + 3.0 * s.total_len
                  + 9.0 * dl.dl * s.n_docs)
               + 0.5) AS BIGINT) AS st_u
      FROM tf JOIN df USING (tok) JOIN dl USING (doc_id) CROSS JOIN stats s
    ),
    bm AS (
      SELECT doc_id, CAST(sum(st_u) AS BIGINT) AS score_micro
      FROM per_term GROUP BY doc_id
    ),
    lex AS (
      SELECT doc_id, CAST(rnk AS BIGINT) AS lex_rnk
      FROM (
        SELECT doc_id,
               row_number() OVER (ORDER BY score_micro DESC, doc_id ASC) AS rnk
        FROM bm
      ) WHERE rnk <= 20
    ),
    e AS (SELECT vec_id, embedding::DOUBLE[] AS v, label FROM embeddings),
    base AS (SELECT * FROM e WHERE (vec_id * 31 + 7) % 10 <> 3),
    c AS (
      SELECT label AS cell, v AS centroid FROM base
      QUALIFY row_number() OVER (PARTITION BY label ORDER BY vec_id ASC) = 1
    ),
    assigned AS (
      SELECT vec_id, v, cell FROM (
        SELECT e.vec_id, e.v, c.cell,
               row_number() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY round(list_dot_product(e.v, c.centroid)
                   / (sqrt(list_dot_product(e.v, e.v))
                      * sqrt(list_dot_product(c.centroid, c.centroid))), 6) DESC,
                 c.cell ASC) AS rn
        FROM e CROSS JOIN c
      ) WHERE rn = 1
    ),
    qv AS (SELECT v FROM e WHERE vec_id = 7),
    probes AS (
      SELECT cell FROM (
        SELECT c.cell,
               row_number() OVER (
                 ORDER BY round(list_dot_product(q.v, c.centroid)
                   / (sqrt(list_dot_product(q.v, q.v))
                      * sqrt(list_dot_product(c.centroid, c.centroid))), 6) DESC,
                 c.cell ASC) AS rn
        FROM qv q CROSS JOIN c
      ) WHERE rn <= 3
    ),
    sem AS (
      SELECT doc_id, CAST(rnk AS BIGINT) AS sem_rnk
      FROM (
        SELECT a.vec_id AS doc_id,
               row_number() OVER (
                 ORDER BY round(list_dot_product(q.v, a.v)
                   / (sqrt(list_dot_product(q.v, q.v))
                      * sqrt(list_dot_product(a.v, a.v))), 6) DESC,
                 a.vec_id ASC) AS rnk
        FROM assigned a JOIN probes p ON a.cell = p.cell CROSS JOIN qv q
        WHERE a.vec_id <> 7
      ) WHERE rnk <= 20
    ),
    fused AS (
      SELECT doc_id, lex_rnk, sem_rnk,
             COALESCE(CAST(floor(1000000.0 / (60 + lex_rnk)) AS BIGINT), 0)
             + COALESCE(CAST(floor(1000000.0 / (60 + sem_rnk)) AS BIGINT), 0)
               AS rrf_micro
      FROM lex FULL JOIN sem USING (doc_id)
    )
    SELECT doc_id, rrf_micro, lex_rnk, sem_rnk, CAST(rnk AS BIGINT) AS rnk
    FROM (
      SELECT *, row_number() OVER (ORDER BY rrf_micro DESC, doc_id ASC) AS rnk
      FROM fused
    ) WHERE rnk <= 10
    """


@query("q187_hybrid_ivf_serving", oracle=_Q187_ORACLE)
def q187_hybrid_ivf_serving(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval with BOTH lists served from maintained indexes —
    closing VERDICT r9 #2: q186 probes the lexical side from q179's
    maintained BM25 layouts but still computes its semantic top-20 as an
    exact O(docs) vector pass, which at 100 TB is a full-corpus scan per
    query while the lexical side prunes buckets. Here the semantic list
    comes from q177's maintained cell-partitioned IVF layout instead: the
    query vector (doc 7's embedding, the q182 fixture contract) selects its
    top-3 quantizer cells against the broadcast frozen-medoid centroid
    table, the index scan reads ONLY those cells' directories (static
    partition pruning from a bounded ≤3-int `isin`, plan-asserted via
    ivf_index_probe), and exact round-6 cosine runs inside probed cells
    only. Per-query semantic cost drops from O(corpus vectors) to
    O(probed-cell vectors) — the same serve economics the lexical probe
    already has — while maintenance stays O(batch) appends on both indexes.

    The fusion is q182's integer RRF (⌊10⁶/(60+r)⌋, k=60), a full-outer
    join of two ≤20-row lists. Semantics differ from q182/q186 BY DESIGN —
    the semantic list is the IVF approximation, not the exact scan — so
    this query carries its OWN full-recompute oracle, which restates the
    frozen quantizer, the cell assignment of the post-append index, the
    top-3 cell restriction, and the fusion in ANSI SQL; recall of the
    approximate fusion against q182's exact one is measured separately in
    tests (the q58-vs-q57 pattern). Reference tie: the planned
    search/analysis stage the reference never built (README.md:24,41)."""
    from wikipediaetl_spark.operators.layout import _drop_table
    from wikipediaetl_spark.operators.text_analysis import (
        bm25_index_probe,
        build_bm25_layouts,
    )

    pt, lt = "q187_bm25_postings", "q187_bm25_doclen"
    build_bm25_layouts(spark, sf_dir, pt, lt)
    lex = bm25_index_probe(spark.table(pt), spark.table(lt), k=20).select(
        "doc_id", F.col("rnk").alias("lex_rnk")
    )

    it = "q187_ivf_cell_index"
    cents = build_ivf_index(spark, sf_dir, it)
    e = _vectors(spark, sf_dir)
    q = e.filter(F.col("vec_id") == 7).select(
        F.col("vec_id").cast("long").alias("query_id"), F.col("v").alias("qv")
    )
    c_sim = F.round(cosine_expr(F.col("qv"), F.col("centroid")), 6)
    wq = W.partitionBy("query_id").orderBy(F.col("c_sim").desc(), F.col("cell").asc())
    probes = (
        F.broadcast(q)
        .crossJoin(F.broadcast(cents))
        .select("query_id", "qv", "cell", c_sim.alias("c_sim"))
        .withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= 3)
        .select("query_id", "qv", "cell")
    )
    # bounded collect: ≤ 3 cell ids for ONE query vector — the serve-time
    # partition-pruning parameter, same class as q177's probe set
    cells = [r["cell"] for r in probes.select("cell").distinct().collect()]
    idx = spark.table(it).filter(F.col("cell").isin(cells))
    sem = ivf_index_probe(probes, idx, k=20).select(
        F.col("neighbor_id").alias("doc_id"), F.col("rnk").alias("sem_rnk")
    )
    res = rrf_fuse(lex, sem).localCheckpoint(eager=True)
    for t in (pt, f"{pt}_staging", lt, f"{lt}_staging", it):
        _drop_table(spark, t)
    return res
