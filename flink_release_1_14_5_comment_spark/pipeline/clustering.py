"""Distributed k-means over embedding vectors (semantic clustering).

Training-data pipelines cluster document embeddings to (a) semantically
dedup near-identical content that lexical MinHash misses, (b) balance topic
mixtures, (c) build IVF cells for ANN (pipeline/similarity.py consumes
exactly this shape). The reference ships the same capability as
``flink-ml``'s iterative clustering on DataSet iterations
(flink-libraries/flink-gelly's iteration machinery; SURVEY §2.9
"Iterations (bulk)") — here it's Lloyd's algorithm as a driver loop of
DataFrame ops, the canonical Spark formulation (MLlib's KMeans broadcasts
centroids the same way):

* **assignment step**: the k centroids are driver-held (k×dims doubles —
  always tiny) and embedded as a LITERAL array-of-structs column, so the
  argmax-cosine is a pure per-row codegen expression: the corpus never
  shuffles, never even joins. (A first cut used crossJoin(broadcast) + a
  row_number window — that shuffles the k×-replicated corpus every
  iteration; this formulation removes that entirely.)
* **update step**: the ONLY shuffle, once per iteration, keyed by
  (cluster, dim) — partial aggregation makes it a map-side combine, so the
  exchange carries k × dims partial sums per task, not vectors. The new
  centroids (k rows) are collected to the driver for the next round's
  literal — the same k×dims round-trip MLlib's iteration does.

At 100 TB this is the textbook plan: per iteration, one codegen map over
the corpus + one map-side-combined shuffle of k×dims doubles. Spherical
variant (cosine, not euclidean): embeddings are direction-normalized
downstream, matching the ANN/near-dup modules.

Determinism contract (what makes the DuckDB oracle possible): init
centroids = the k lowest vec_ids; cosine rounded to 6 decimals before the
argmax with lowest-cluster-id tie-break (struct max over (csim, -cluster));
centroid components = round(sum, 6)/count — distributed float-sum
reassociation cancels, and driver collect preserves the exact IEEE doubles
(see similarity._centroids).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_release_1_14_5_comment_spark.catalog import register_views
from flink_release_1_14_5_comment_spark.pipeline.similarity import (
    _norm,
    _spread,
)

K = 8
ITERS = 3
DIMS = 64


def _sims_col(cents: list[tuple[int, list[float]]]) -> F.Column:
    """array<struct<csim, negc>> of rounded cosines against a LITERAL
    centroid array (norms precomputed driver-side). Struct order makes
    max == argmax (csim DESC, cluster ASC).

    Keep the transform/zip_with/aggregate formulation: the r10 A/B that
    unrolled this into k*dims element_at terms (8x64 = 512-node tree)
    blew the JVM 64KB codegen method limit, fell back to interpreting the
    giant tree, and ran 5-10x SLOWER (OPTIMIZATION_r10.md "REVERTED")."""
    lit = F.array(*[
        F.struct(
            F.lit(int(c)).alias("cluster"),
            F.array(*[F.lit(float(x)) for x in v]).alias("cent"),
            F.lit(math.sqrt(sum(float(x) * float(x) for x in v))).alias("cnorm"),
        )
        for c, v in cents
    ])
    return F.transform(
        lit,
        lambda s: F.struct(
            F.round(
                F.aggregate(
                    F.zip_with("embedding", s["cent"],
                               lambda x, y: x.cast("double") * y.cast("double")),
                    F.lit(0.0),
                    lambda acc, v: acc + v,
                ) / (F.col("nrm") * s["cnorm"]),
                6,
            ).alias("csim"),
            (-s["cluster"]).alias("negc"),
        ),
    )


def _assign_col(cents: list[tuple[int, list[float]]]) -> F.Column:
    """argmax-cosine cluster id as a pure codegen expression."""
    best = F.array_max(_sims_col(cents))
    return (-best["negc"]).cast("int")


def kmeans_assign(vectors: DataFrame,
                  cents: list[tuple[int, list[float]]]) -> DataFrame:
    """Nearest-centroid assignment by cosine — a zero-shuffle map.
    `vectors` needs (vec_id, embedding, nrm); output adds `cluster`."""
    return vectors.withColumn("cluster", _assign_col(cents))


def _update_centroids(assigned: DataFrame,
                      dims: int = DIMS) -> list[tuple[int, list[float]]]:
    """Mean per (cluster, dim) → k driver-held centroid rows: posexplode →
    (cluster, pos) partial-aggregated shuffle → per-cluster collect_list
    re-assembly. Values: round(sum, 6)/count per component — distributed
    float-sum reassociation noise cancels in the 6-dp round (the
    determinism contract in the module docstring). Empty clusters drop
    (same in the oracle). ``dims`` is accepted for signature stability but
    unused — posexplode infers positions from the array itself.

    r11 NOTE — the r10 "wide aggregate" variant (64 per-dim
    `round(sum(element_at(embedding, i+1)), 6)/count` columns in ONE
    aggregate, no explosion) was REVERTED here after an 8-pair cold-JVM
    A/B under driver conditions: the wide agg's warm median is BIMODAL —
    6/8 trials ~2.2-2.3 s but 2/8 at 3.0-3.3 s (the driver's r10 artifact
    recorded exactly that slow mode: embedding_kmeans 2.63 → 3.09 s),
    while this posexplode shape never left 2.26-2.46 s across 8 trials
    (avg warm median 2.36 vs 2.56). The r10 rationale ("no 64× row
    explosion feeds the exchange") was overstated: hash-aggregate PARTIAL
    mode already reduces the explosion map-side, so the exchange carries
    ~k×dims partial sums per task under BOTH shapes — the wide agg saves
    no shuffle bytes at any scale, and its 64-column codegen'd aggregate
    is the suspected source of the slow mode (cf. the r10 unrolled-_DOT
    lesson: giant generated expression trees lose). Old wide-agg text
    preserved in tests/ab_compare_r10.py history via git."""
    rows = (
        assigned.select("cluster", F.posexplode("embedding").alias("pos", "v"))
        .groupBy("cluster", "pos")
        .agg((F.round(F.sum("v"), 6) / F.count(F.lit(1))).alias("cv"))
        .groupBy("cluster")
        .agg(F.transform(
            F.sort_array(F.collect_list(F.struct("pos", "cv"))),
            lambda s: s["cv"]).alias("cent"))
        .collect()
    )
    return [(r["cluster"], list(r["cent"])) for r in rows]


def farthest_point_seeds(e: DataFrame, k: int) -> list[tuple[int, list[float]]]:
    """Deterministic farthest-point seeding (Gonzalez k-center — the
    derandomized cousin of k-means++: instead of sampling ∝ distance², take
    the argmax): seed 0 = lowest vec_id; each next seed = the vector whose
    best cosine to any chosen seed is LOWEST (i.e. max-min angular distance),
    ties to lowest vec_id. Cost: k-1 passes, each a pure codegen map (the
    same literal-centroid expression as assignment) + a TakeOrdered(1) —
    no shuffle of the corpus. `e` needs (vec_id, embedding, nrm)."""
    first = e.orderBy("vec_id").limit(1).select("vec_id", "embedding").collect()[0]
    seeds = [(int(first["vec_id"]), list(first["embedding"]))]
    for _ in range(k - 1):
        best = F.array_max(_sims_col(seeds))["csim"]
        chosen = [s[0] for s in seeds]
        nxt = (e.filter(~F.col("vec_id").isin(chosen))
               .select("vec_id", "embedding", best.alias("best_sim"))
               .orderBy("best_sim", "vec_id").limit(1).collect())
        if not nxt:  # fewer distinct vectors than k
            break
        seeds.append((int(nxt[0]["vec_id"]), list(nxt[0]["embedding"])))
    # re-key clusters 0..k-1 in selection order (stable, id-independent)
    return [(i, v) for i, (_, v) in enumerate(seeds)]


def kmeans_centroids(vectors: DataFrame, k: int = K, iters: int = ITERS,
                     seeding: str = "lowest_id",
                     ) -> tuple[DataFrame, list[tuple[int, list[float]]]]:
    """Train: returns (persisted normed vector frame, final centroid list)
    — the centroids after iters-1 update rounds, i.e. the ones the iters-th
    assignment scores against. Exposed separately so multi-probe / IVF-style
    consumers can reuse the trained cells without refitting.

    ``seeding``: "lowest_id" (default — the k lowest vec_ids; what the
    graded oracle unrolls) or "farthest" (Gonzalez max-min seeding, better
    cluster quality on clumped corpora, still fully deterministic).
    """
    e = vectors.withColumn("nrm", _norm("embedding")).persist()
    if seeding == "farthest":
        cents = farthest_point_seeds(e, k)
    elif seeding == "lowest_id":
        cents = [
            (int(r["vec_id"]), list(r["embedding"]))
            for r in e.orderBy("vec_id").limit(k)
            .select("vec_id", "embedding").collect()
        ]
    else:
        raise ValueError(f"unknown seeding: {seeding!r}")
    for _ in range(iters - 1):
        cents = _update_centroids(kmeans_assign(e, cents),
                                  dims=len(cents[0][1]))
    return e, cents


def kmeans_fit(vectors: DataFrame, k: int = K, iters: int = ITERS,
               seeding: str = "lowest_id") -> DataFrame:
    """Lloyd's k-means, fixed iteration count; returns (vec_id, cluster)."""
    e, cents = kmeans_centroids(vectors, k, iters, seeding=seeding)
    # e stays cached: the returned frame is lazy and its final assignment
    # map still reads e — unpersisting here would recompute the norms pass.
    return kmeans_assign(e, cents).select("vec_id", "cluster")


def kmeans_assign_topm(vectors: DataFrame,
                       cents: list[tuple[int, list[float]]],
                       m: int) -> DataFrame:
    """Multi-probe assignment: each vector's top-`m` clusters by cosine
    (same rounding/tie-break as the argmax). Still a pure map — the sims
    array sorts per row (ascending struct order; the LAST m entries are the
    top-m, since max struct == argmax (csim, -cluster)) and explodes to
    (vec_id, embedding, nrm, probe_rank, cluster), probe_rank 1 = best."""
    lit_sims = F.array_sort(_sims_col(cents))
    topm = F.slice(F.reverse(lit_sims), 1, m)
    exploded = vectors.select(
        "vec_id", "embedding", "nrm",
        F.posexplode(topm).alias("pr", "s"),
    )
    return exploded.select(
        "vec_id", "embedding", "nrm",
        (F.col("pr") + 1).alias("probe_rank"),
        (-F.col("s.negc")).cast("int").alias("cluster"),
    )


def q_embedding_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic cluster assignment for every embedding (k=8, 3 iterations)."""
    t = register_views(spark, sf_dir)
    return kmeans_fit(_spread(t["embeddings"]).select("vec_id", "embedding"))


def q_embedding_cluster_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster cardinality — the balance report a curation run reads before
    sampling per-cluster quotas."""
    t = register_views(spark, sf_dir)
    e = _spread(t["embeddings"]).select("vec_id", "embedding")
    assign = kmeans_fit(e)
    return (assign.groupBy("cluster")
            .agg(F.count(F.lit(1)).alias("n_members"))
            .orderBy("cluster"))


def _kmeans_oracle_ctes(k: int = K, iters: int = ITERS, dims: int = DIMS) -> str:
    """Unrolled fixed-iteration Lloyd's in DuckDB (one assign CTE + one
    centroid CTE per round — mechanically the Spark loop; same rounding)."""
    parts = [
        f"WITH comp AS (SELECT vec_id, pos - 1 AS pos, embedding[pos] AS v\n"
        f"  FROM embeddings, generate_series(1, {dims}) AS t(pos)),",
        f"c0 AS (SELECT CAST(vec_id AS INT) AS cluster, list(v ORDER BY pos) AS cent\n"
        f"  FROM comp WHERE vec_id < {k} GROUP BY vec_id),",
    ]
    prev = "c0"
    for i in range(1, iters + 1):
        parts.append(
            f"a{i} AS (SELECT vec_id, cluster FROM (\n"
            f"  SELECT e.vec_id, c.cluster,\n"
            f"    ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY\n"
            f"      ROUND(list_cosine_similarity(e.embedding::DOUBLE[], c.cent), 6) DESC,\n"
            f"      c.cluster) AS rn\n"
            f"  FROM embeddings e CROSS JOIN {prev} c) WHERE rn = 1),"
        )
        if i < iters:
            parts.append(
                f"c{i} AS (SELECT cluster, list(cv ORDER BY pos) AS cent FROM (\n"
                f"  SELECT a.cluster, m.pos, ROUND(SUM(m.v), 6) / COUNT(*) AS cv\n"
                f"  FROM a{i} a JOIN comp m ON m.vec_id = a.vec_id\n"
                f"  GROUP BY a.cluster, m.pos) GROUP BY cluster),"
            )
            prev = f"c{i}"
    parts[-1] = parts[-1].rstrip(",")
    return "\n".join(parts)


ORACLE_Q_EMBEDDING_KMEANS = (
    _kmeans_oracle_ctes()
    + f"\nSELECT vec_id, cluster FROM a{ITERS}"
)

ORACLE_Q_EMBEDDING_CLUSTER_SIZES = (
    _kmeans_oracle_ctes()
    + f"\nSELECT cluster, CAST(COUNT(*) AS BIGINT) AS n_members"
    + f"\nFROM a{ITERS} GROUP BY cluster ORDER BY cluster"
)


SAMPLE_MOD = 3  # mini-batch keeps ~1/MOD of the corpus per round


def _batch_member(i: int, mod: int = SAMPLE_MOD) -> F.Column:
    """Deterministic mini-batch membership for round `i`: md5 of
    "vec_id:i" — portable across Spark and DuckDB (same trick as
    quality.q_split_assign), so the oracle can unroll the exact batches.
    A fresh salt per round means every round sees an independent sample,
    the property Sculley's mini-batch k-means relies on."""
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("vec_id").cast("string"), F.lit(f":{i}"))),
                1, 6),
            16, 10,
        ).cast("bigint") % mod
    ) == 0


def minibatch_kmeans_centroids(
    vectors: DataFrame, k: int = K, iters: int = ITERS,
    mod: int = SAMPLE_MOD,
) -> tuple[DataFrame, list[tuple[int, list[float]]]]:
    """Mini-batch k-means (Sculley, WWW 2010, distributed batch-mean
    variant): each update round assigns only a deterministic ~1/mod sample
    of the corpus and moves each centroid to the MEAN of its batch members;
    centroids with no batch member carry over unchanged. Sculley's
    sequential per-point learning-rate update (c ← (1-η)c + ηx) is
    inherently order-dependent, so the distributed formulation every engine
    uses (MLlib's miniBatchFraction on the old RDD KMeans did the same) is
    the batch-mean: still an unbiased step toward the full-batch optimum,
    but associative, shuffle-friendly, and exactly reproducible.

    Why it exists next to full Lloyd's (`kmeans_centroids`): at 100 TB a
    full assignment pass per iteration is the dominant cost; mini-batch
    cuts per-round cost to |corpus|/mod map work + the same k×dims shuffle,
    trading per-round progress for wall-clock — the standard knob when the
    corpus outgrows full-pass iteration. Same determinism contract as the
    full version (lowest-id seeds, 6-decimal rounding), so the DuckDB
    oracle unrolls it exactly.
    """
    e = vectors.withColumn("nrm", _norm("embedding")).persist()
    cents = [
        (int(r["vec_id"]), list(r["embedding"]))
        for r in e.orderBy("vec_id").limit(k)
        .select("vec_id", "embedding").collect()
    ]
    for i in range(1, iters + 1):
        batch = e.filter(_batch_member(i, mod))
        upd = dict(_update_centroids(kmeans_assign(batch, cents),
                                     dims=len(cents[0][1])))
        cents = [(c, upd.get(c, v)) for c, v in cents]
    return e, cents


def minibatch_kmeans_fit(vectors: DataFrame, k: int = K, iters: int = ITERS,
                         mod: int = SAMPLE_MOD) -> DataFrame:
    """Mini-batch training + one final full assignment pass →
    (vec_id, cluster)."""
    e, cents = minibatch_kmeans_centroids(vectors, k, iters, mod)
    return kmeans_assign(e, cents).select("vec_id", "cluster")


def q_embedding_kmeans_minibatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster assignment trained on deterministic ~1/3 mini-batches
    (k=8, 3 rounds) — the scale path when full-pass Lloyd's is too slow."""
    t = register_views(spark, sf_dir)
    return minibatch_kmeans_fit(
        _spread(t["embeddings"]).select("vec_id", "embedding"))


def _minibatch_oracle_ctes(k: int = K, iters: int = ITERS,
                           dims: int = DIMS, mod: int = SAMPLE_MOD) -> str:
    """Unrolled mini-batch rounds in DuckDB: per round, assignment CTE
    restricted to that round's md5-mod batch, centroid CTE = batch means
    COALESCE'd over the previous centroids (empty-cell carry)."""
    parts = [
        f"WITH comp AS (SELECT vec_id, pos - 1 AS pos, embedding[pos] AS v\n"
        f"  FROM embeddings, generate_series(1, {dims}) AS t(pos)),",
        f"c0 AS (SELECT CAST(vec_id AS INT) AS cluster, list(v ORDER BY pos) AS cent\n"
        f"  FROM comp WHERE vec_id < {k} GROUP BY vec_id),",
    ]
    for i in range(1, iters + 1):
        parts.append(
            f"a{i} AS (SELECT vec_id, cluster FROM (\n"
            f"  SELECT e.vec_id, c.cluster,\n"
            f"    ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY\n"
            f"      ROUND(list_cosine_similarity(e.embedding::DOUBLE[], c.cent), 6) DESC,\n"
            f"      c.cluster) AS rn\n"
            f"  FROM embeddings e CROSS JOIN c{i - 1} c\n"
            f"  WHERE CAST('0x' || substr(md5(CAST(e.vec_id AS VARCHAR) || ':{i}'), 1, 6)\n"
            f"        AS BIGINT) % {mod} = 0) WHERE rn = 1),"
        )
        parts.append(
            f"c{i} AS (SELECT p.cluster, COALESCE(n.cent, p.cent) AS cent\n"
            f"  FROM c{i - 1} p LEFT JOIN (\n"
            f"    SELECT cluster, list(cv ORDER BY pos) AS cent FROM (\n"
            f"      SELECT a.cluster, m.pos, ROUND(SUM(m.v), 6) / COUNT(*) AS cv\n"
            f"      FROM a{i} a JOIN comp m ON m.vec_id = a.vec_id\n"
            f"      GROUP BY a.cluster, m.pos) GROUP BY cluster) n\n"
            f"  ON n.cluster = p.cluster),"
        )
    parts[-1] = parts[-1].rstrip(",")
    return "\n".join(parts)


ORACLE_Q_EMBEDDING_KMEANS_MINIBATCH = (
    _minibatch_oracle_ctes()
    + f"""
SELECT vec_id, cluster FROM (
  SELECT e.vec_id, c.cluster,
    ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
      ROUND(list_cosine_similarity(e.embedding::DOUBLE[], c.cent), 6) DESC,
      c.cluster) AS rn
  FROM embeddings e CROSS JOIN c{ITERS} c) WHERE rn = 1
"""
)


SEMANTIC_DUP_THRESHOLD = 0.4  # mirrors similarity.EMB_DUP_THRESHOLD


def q_dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic near-dup pairs via CLUSTER-BOUNDED pairing: k-means assigns
    every vector to a cell, exact cosine runs only WITHIN each cell, pairs
    with sim ≥ 0.4 emit. The third sub-quadratic pairing strategy in the
    repo, complementing MinHash bands (lexical) and sign-LSH bands
    (similarity.q_dedup_embedding): candidate volume is Σ |cell|²/2 instead
    of n²/2, and the cells are semantically meaningful (the same partition
    a curation run uses for mixture balancing), so one clustering pays for
    both jobs.

    Recall caveat (same as IVF vs brute force): a near-dup pair split
    across a cell boundary is missed — the standard fix is multi-probe
    (assign each vector to its top-2 cells); the oracle mirrors the exact
    single-assignment semantics, so the gate checks the plan faithfully.

    Scale: pairing shuffles on the cluster id (k bounded partitions —
    balance depends on cluster sizes; skewed cells → AQE skew-join or a
    size cap, as with hot LSH buckets); vectors join back by id.
    """
    t = register_views(spark, sf_dir)
    e = _spread(t["embeddings"]).select("vec_id", "embedding")
    assign = kmeans_fit(e)
    e_n = (e.withColumn("nrm", _norm("embedding"))
           .join(assign, "vec_id"))
    a = e_n.select(F.col("cluster"), F.col("vec_id").alias("id_a"),
                   F.col("embedding").alias("ea"), F.col("nrm").alias("na_"))
    b = e_n.select(F.col("cluster"), F.col("vec_id").alias("id_b"),
                   F.col("embedding").alias("eb"), F.col("nrm").alias("nb_"))
    dot = F.aggregate(
        F.zip_with("ea", "eb", lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0), lambda acc, v: acc + v)
    return (
        a.join(b, "cluster")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("sim", F.round(dot / (F.col("na_") * F.col("nb_")), 4))
        .filter(F.col("sim") >= SEMANTIC_DUP_THRESHOLD)
        .select("cluster", "id_a", "id_b", "sim")
    )


ORACLE_Q_DEDUP_SEMANTIC = (
    _kmeans_oracle_ctes()
    + f"""
SELECT a.cluster, a.vec_id AS id_a, b.vec_id AS id_b,
       ROUND(list_cosine_similarity(ea.embedding::DOUBLE[],
                                    eb.embedding::DOUBLE[]), 4) AS sim
FROM a{ITERS} a JOIN a{ITERS} b
  ON a.cluster = b.cluster AND a.vec_id < b.vec_id
JOIN embeddings ea ON ea.vec_id = a.vec_id
JOIN embeddings eb ON eb.vec_id = b.vec_id
WHERE ROUND(list_cosine_similarity(ea.embedding::DOUBLE[],
                                   eb.embedding::DOUBLE[]), 4)
      >= {SEMANTIC_DUP_THRESHOLD}
"""
)


N_PROBES = 2


def q_dedup_semantic_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`dedup_semantic` with MULTI-PROBE assignment (each vector probes its
    top-2 cells) — the recall fix for pairs split across a cell boundary:
    a pair is a candidate if ANY probed cell is shared. Candidates dedup to
    (id_a, id_b) BEFORE the exact-cosine join, so a pair sharing both cells
    scores once. Probe count trades recall vs candidate volume exactly like
    IVF's nprobe (similarity.q_ann_ivf_topk)."""
    t = register_views(spark, sf_dir)
    e, cents = kmeans_centroids(
        _spread(t["embeddings"]).select("vec_id", "embedding"))
    probes = kmeans_assign_topm(e, cents, m=N_PROBES)
    a = probes.select("cluster", F.col("vec_id").alias("id_a"))
    b = probes.select("cluster", F.col("vec_id").alias("id_b"))
    cand = (a.join(b, "cluster")
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b").distinct())
    e_n = e.select("vec_id", "embedding", "nrm")
    dot = F.aggregate(
        F.zip_with("ea", "eb", lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0), lambda acc, v: acc + v)
    return (
        cand.join(e_n.select(F.col("vec_id").alias("id_a"),
                             F.col("embedding").alias("ea"),
                             F.col("nrm").alias("na_")), "id_a")
        .join(e_n.select(F.col("vec_id").alias("id_b"),
                         F.col("embedding").alias("eb"),
                         F.col("nrm").alias("nb_")), "id_b")
        .withColumn("sim", F.round(dot / (F.col("na_") * F.col("nb_")), 4))
        .filter(F.col("sim") >= SEMANTIC_DUP_THRESHOLD)
        .select("id_a", "id_b", "sim")
    )


ORACLE_Q_DEDUP_SEMANTIC_MULTIPROBE = (
    _kmeans_oracle_ctes()
    + f""",
probe AS (SELECT vec_id, cluster FROM (
  SELECT e.vec_id, c.cluster,
    ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
      ROUND(list_cosine_similarity(e.embedding::DOUBLE[], c.cent), 6) DESC,
      c.cluster) AS rn
  FROM embeddings e CROSS JOIN c{ITERS - 1} c) WHERE rn <= {N_PROBES}),
cand AS (
  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
  FROM probe a JOIN probe b
    ON a.cluster = b.cluster AND a.vec_id < b.vec_id)
SELECT c.id_a, c.id_b,
       ROUND(list_cosine_similarity(ea.embedding::DOUBLE[],
                                    eb.embedding::DOUBLE[]), 4) AS sim
FROM cand c
JOIN embeddings ea ON ea.vec_id = c.id_a
JOIN embeddings eb ON eb.vec_id = c.id_b
WHERE ROUND(list_cosine_similarity(ea.embedding::DOUBLE[],
                                   eb.embedding::DOUBLE[]), 4)
      >= {SEMANTIC_DUP_THRESHOLD}
"""
)


QUERIES = {
    "embedding_kmeans": q_embedding_kmeans,
    "embedding_kmeans_minibatch": q_embedding_kmeans_minibatch,
    "embedding_cluster_sizes": q_embedding_cluster_sizes,
    "dedup_semantic": q_dedup_semantic,
    "dedup_semantic_multiprobe": q_dedup_semantic_multiprobe,
}

ORACLE = {
    "embedding_kmeans": ORACLE_Q_EMBEDDING_KMEANS,
    "embedding_kmeans_minibatch": ORACLE_Q_EMBEDDING_KMEANS_MINIBATCH,
    "embedding_cluster_sizes": ORACLE_Q_EMBEDDING_CLUSTER_SIZES,
    "dedup_semantic": ORACLE_Q_DEDUP_SEMANTIC,
    "dedup_semantic_multiprobe": ORACLE_Q_DEDUP_SEMANTIC_MULTIPROBE,
}
