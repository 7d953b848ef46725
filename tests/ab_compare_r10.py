"""Paired A/B harness for the r10 optimization round.

This rig's wall-clock noise is documented at 2-3x swings within minutes
(BENCH_NOTES), so sequential before/after profiling is unusable. This
harness instead keeps the OLD (HEAD-of-r9, verbatim) implementation of
every optimized query inline and alternates OLD/NEW runs inside ONE tuned
session: per round, each variant gets `clearCache()` + a fresh run (pays
its own persists, i.e. the single-shot cost) + a cached re-run (the bench's
warm steady state). Pairing makes host drift hit both variants equally;
the per-round ratio and the min over rounds are the honest readings.

    python tests/ab_compare_r10.py [query ...] [--rounds N] [--sf DIR]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


# --- OLD implementations (verbatim from git e7984ae, minus docstrings) ----

def old_bm25_scores(spark, docs, qterms):
    from flink_release_1_14_5_comment_spark.pipeline.retrieval import (
        _B, _K1, _tok_arr)
    dl = docs.select("doc_id", F.size(_tok_arr()).cast("long").alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"))
    toks = docs.select("doc_id", F.explode(_tok_arr()).alias("tok"))
    hits = toks.join(F.broadcast(qterms), toks.tok == qterms.term, "inner")
    tf = hits.groupBy("qid", "term", "doc_id").agg(F.count(F.lit(1)).alias("tf"))
    df_ = (hits.select("term", "doc_id").distinct()
           .groupBy("term").agg(F.count(F.lit(1)).alias("df")))
    idf = F.log((F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0)
    per_term = (
        tf.join(F.broadcast(df_), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .withColumn("w", idf * F.col("tf") * (_K1 + 1.0)
                    / (F.col("tf") + _K1 * (1.0 - _B + _B * F.col("dl") / F.col("avgdl")))))
    return per_term.groupBy("qid", "doc_id").agg(F.round(F.sum("w"), 4).alias("score"))


def old_bm25_topk(spark, sf_dir):
    from flink_release_1_14_5_comment_spark.catalog import register_views
    from flink_release_1_14_5_comment_spark.operators.scale import topk_per_key
    from flink_release_1_14_5_comment_spark.pipeline.retrieval import (
        _BM25_QUERIES, _TOP_K)
    t = register_views(spark, sf_dir)
    rows = [(qid, term) for qid, terms in _BM25_QUERIES for term in terms]
    qterms = spark.createDataFrame(rows, "qid int, term string")
    scored = old_bm25_scores(spark, t["documents"], qterms)
    return (topk_per_key(scored, "qid", [F.col("score").desc(), F.col("doc_id")], _TOP_K)
            .withColumn("rn", F.col("rn").cast("long"))
            .select(F.col("qid").cast("int").alias("qid"), "doc_id", "score", "rn"))


def old_hybrid_rrf_fusion(spark, sf_dir):
    from flink_release_1_14_5_comment_spark.catalog import register_views
    from flink_release_1_14_5_comment_spark.operators.scale import topk_per_key
    from flink_release_1_14_5_comment_spark.pipeline.retrieval import (
        _DOT, _PROBES, _RRF_DEPTH, _RRF_K, _TOP_K, _tok_arr)
    t = register_views(spark, sf_dir)
    docs, emb = t["documents"], t["embeddings"]
    probes_pred = F.col("doc_id").isin(*_PROBES)
    pe = (emb.filter(F.col("vec_id").isin(*_PROBES))
          .select(F.col("vec_id").alias("qid"), F.col("embedding").alias("qe"),
                  F.sqrt(F.expr(_DOT.format(a="embedding", b="embedding"))).alias("qn")))
    corpus = emb.select(
        "vec_id", "embedding",
        F.sqrt(F.expr(_DOT.format(a="embedding", b="embedding"))).alias("en"))
    dscored = corpus.crossJoin(F.broadcast(pe)).select(
        "qid", F.col("vec_id").alias("doc_id"),
        F.round(F.expr(_DOT.format(a="embedding", b="qe")) / (F.col("en") * F.col("qn")), 4).alias("dscore"))
    dense = topk_per_key(dscored, "qid", [F.col("dscore").desc(), F.col("doc_id")],
                         _RRF_DEPTH, rank_col="drank")
    qterms = (docs.filter(probes_pred)
              .select(F.col("doc_id").cast("int").alias("qid"),
                      F.explode(_tok_arr()).alias("term")).distinct())
    sparse = topk_per_key(old_bm25_scores(spark, docs, qterms),
                          "qid", [F.col("score").desc(), F.col("doc_id")],
                          _RRF_DEPTH, rank_col="srank")
    fused = (dense.select("qid", "doc_id", "drank")
             .join(sparse.select("qid", "doc_id", "srank"), ["qid", "doc_id"], "full_outer")
             .withColumn("rrf", F.round(
                 F.coalesce(1.0 / (_RRF_K + F.col("drank")), F.lit(0.0))
                 + F.coalesce(1.0 / (_RRF_K + F.col("srank")), F.lit(0.0)), 6)))
    return (topk_per_key(fused, "qid", [F.col("rrf").desc(), F.col("doc_id")], _TOP_K)
            .withColumn("rn", F.col("rn").cast("long"))
            .select(F.col("qid").cast("int").alias("qid"), "doc_id", "rrf",
                    F.col("drank").cast("long").alias("dense_rank"),
                    F.col("srank").cast("long").alias("sparse_rank"), "rn"))


def old_ann_pq_topk(spark, sf_dir):
    from pyspark.sql import Window as W
    from flink_release_1_14_5_comment_spark.catalog import register_views
    from flink_release_1_14_5_comment_spark.operators.scale import topk_per_key
    from flink_release_1_14_5_comment_spark.pipeline.similarity import (
        N_QUERIES, PQ_SUBDIM, _spread)
    t = register_views(spark, sf_dir)
    e = _spread(t["embeddings"])
    comp = (e.select("vec_id", "label",
                     F.posexplode(F.col("embedding").cast("array<double>")).alias("pos", "v"))
            .withColumn("sub", (F.col("pos") / PQ_SUBDIM).cast("int")))
    cb = (comp.groupBy(F.col("label").alias("code"), "pos")
          .agg((F.round(F.sum("v"), 6) / F.count(F.lit(1))).alias("cv"))
          .select("code", "pos", "cv"))
    sq = (F.col("v") - F.col("cv")) * (F.col("v") - F.col("cv"))
    enc = (comp.join(F.broadcast(cb), "pos")
           .groupBy("vec_id", "sub", "code").agg(F.round(F.sum(sq), 6).alias("d2")))
    wenc = W.partitionBy("vec_id", "sub").orderBy("d2", "code")
    codes = (enc.withColumn("rn", F.row_number().over(wenc))
             .filter(F.col("rn") == 1).select("vec_id", "sub", "code"))
    adc = (comp.filter(F.col("vec_id") < N_QUERIES)
           .select(F.col("vec_id").alias("qid"), "pos", "sub", "v")
           .join(F.broadcast(cb), "pos")
           .groupBy("qid", "sub", "code")
           .agg(F.round(F.sum(F.col("v") * F.col("cv")), 6).alias("ip")))
    scored = (codes.join(F.broadcast(adc), ["sub", "code"])
              .filter(F.col("vec_id") != F.col("qid"))
              .groupBy("qid", "vec_id")
              .agg(F.sum(F.col("ip").cast("decimal(12,6)")).cast("double").alias("approx_ip"))
              .select("qid", F.col("vec_id").alias("neighbor_id"), "approx_ip"))
    return (topk_per_key(scored, "qid", [F.col("approx_ip").desc(), F.col("neighbor_id")], 3)
            .withColumn("rn", F.col("rn").cast("long")))


def old_ann_ivfpq_topk(spark, sf_dir):
    from pyspark.sql import Window as W
    from flink_release_1_14_5_comment_spark.catalog import register_views
    from flink_release_1_14_5_comment_spark.operators.scale import topk_per_key
    from flink_release_1_14_5_comment_spark.pipeline.similarity import (
        N_PROBE, N_QUERIES, PQ_SUBDIM, _centroids, _cosine_pre, _norm, _spread)
    t = register_views(spark, sf_dir)
    e = _spread(t["embeddings"])
    cent = _centroids(e).withColumn("cnorm", _norm("cent"))
    e_n = e.withColumn("nrm", _norm("embedding"))
    cscore = e_n.crossJoin(F.broadcast(cent)).select(
        "vec_id", "cell",
        F.round(_cosine_pre("embedding", "cent", "nrm", "cnorm"), 6).alias("csim"))
    w = W.partitionBy("vec_id").orderBy(F.col("csim").desc(), F.col("cell"))
    ranked = cscore.withColumn("rn", F.row_number().over(w)).persist()
    assign = ranked.filter(F.col("rn") == 1).select("vec_id", "cell")
    qcells = (ranked.filter((F.col("vec_id") < N_QUERIES) & (F.col("rn") <= N_PROBE))
              .select(F.col("vec_id").alias("qid"), "cell"))
    cand = (assign.join(F.broadcast(qcells), "cell")
            .filter(F.col("vec_id") != F.col("qid"))
            .select("qid", F.col("vec_id").alias("neighbor_id")).distinct())
    comp = (e.select("vec_id", "label",
                     F.posexplode(F.col("embedding").cast("array<double>")).alias("pos", "v"))
            .withColumn("sub", (F.col("pos") / PQ_SUBDIM).cast("int")))
    cb = (comp.groupBy(F.col("label").alias("code"), "pos")
          .agg((F.round(F.sum("v"), 6) / F.count(F.lit(1))).alias("cv"))
          .select("code", "pos", "cv"))
    sq = (F.col("v") - F.col("cv")) * (F.col("v") - F.col("cv"))
    enc = (comp.join(F.broadcast(cb), "pos")
           .groupBy("vec_id", "sub", "code").agg(F.round(F.sum(sq), 6).alias("d2")))
    wenc = W.partitionBy("vec_id", "sub").orderBy("d2", "code")
    codes = (enc.withColumn("rn", F.row_number().over(wenc))
             .filter(F.col("rn") == 1)
             .select(F.col("vec_id").alias("neighbor_id"), "sub", "code"))
    adc = (comp.filter(F.col("vec_id") < N_QUERIES)
           .select(F.col("vec_id").alias("qid"), "pos", "sub", "v")
           .join(F.broadcast(cb), "pos")
           .groupBy("qid", "sub", "code")
           .agg(F.round(F.sum(F.col("v") * F.col("cv")), 6).alias("ip")))
    scored = (cand.join(codes, "neighbor_id")
              .join(F.broadcast(adc), ["qid", "sub", "code"])
              .groupBy("qid", "neighbor_id")
              .agg(F.sum(F.col("ip").cast("decimal(12,6)")).cast("double").alias("approx_ip")))
    return (topk_per_key(scored, "qid", [F.col("approx_ip").desc(), F.col("neighbor_id")], 3)
            .withColumn("rn", F.col("rn").cast("long")))


def old_duplicate_spans(spark, sf_dir):
    from flink_release_1_14_5_comment_spark.catalog import register_views
    from flink_release_1_14_5_comment_spark.pipeline.text_analysis import _toks
    t = register_views(spark, sf_dir)
    base = (t["documents"].select("doc_id", _toks().alias("t"))
            .filter(F.size("t") >= 8)
            .select("doc_id", F.explode(F.expr(
                "transform(sequence(1, size(t) - 7), "
                "i -> concat_ws(' ', slice(t, i, 8)))")).alias("gram")))
    gram_docs = base.groupBy("gram").agg(F.countDistinct("doc_id").alias("nd"))
    dup = F.sum(F.when(F.col("nd") >= 2, 1).otherwise(0))
    return (base.join(gram_docs, "gram")
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).cast("long").alias("n_windows"),
                 dup.cast("long").alias("n_dup_windows"),
                 F.round(dup / F.count(F.lit(1)), 4).alias("dup_ratio")))


def old_corpus_clean(spark, sf_dir):
    from flink_release_1_14_5_comment_spark.catalog import register_views
    from flink_release_1_14_5_comment_spark.pipeline.dedup import (
        _NORM, _TOKS, near_dup_pairs, shingle_frame)
    t = register_views(spark, sf_dir)
    docs = t["documents"]
    toks = F.expr(_TOKS)
    n_tok = F.size(toks)
    stop_ratio = (F.size(F.expr(
        f"filter({_TOKS}, x -> x IN ('the','a','and','of','to','in'))"
    )).cast("double") / n_tok)
    quality = docs.filter((n_tok >= 20) & (stop_ratio < 0.5)).select(
        "doc_id", "lang", n_tok.alias("n_tok"), F.md5(F.expr(_NORM)).alias("fp"))
    exact_keep = quality.groupBy("fp").agg(F.min("doc_id").alias("doc_id"))
    survivors = quality.join(exact_keep, ["fp", "doc_id"])
    near_dup_losers = (near_dup_pairs(shingle_frame(docs).persist())
                       .select(F.col("doc_b").alias("doc_id")).distinct())
    kept = survivors.join(near_dup_losers, "doc_id", "left_anti")
    return kept.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").cast("long").alias("total_tokens"))


def old_dedup_simhash(spark, sf_dir):
    from flink_release_1_14_5_comment_spark.catalog import register_views
    from flink_release_1_14_5_comment_spark.pipeline.dedup import _TOKS
    t = register_views(spark, sf_dir)
    docs = (t["documents"]
            .repartition(max(spark.sparkContext.defaultParallelism, 8))
            .select("doc_id", F.expr(_TOKS).alias("toks"))
            .filter(F.size("toks") >= 1)
            .select("doc_id", F.expr(
                "transform(toks, x -> cast(conv(substr(md5(x), 1, 4), 16, 10) as int))"
            ).alias("hashes")))
    bit_exprs = [
        F.expr(f"case when aggregate(hashes, 0, (a, h) -> a + cast((h div {1 << b}) % 2 as int)) * 2"
               f" > size(hashes) then {1 << b} else 0 end")
        for b in range(16)]
    fp = bit_exprs[0]
    for x in bit_exprs[1:]:
        fp = fp + x
    sim = docs.select("doc_id", fp.cast("long").alias("simhash"))
    sizes = sim.groupBy("simhash").agg(F.count(F.lit(1)).alias("group_n"))
    return (sim.join(sizes, "simhash")
            .withColumn("half_hi", F.expr("simhash div 256"))
            .withColumn("half_lo", F.expr("simhash % 256"))
            .select("doc_id", "simhash", "half_hi", "half_lo", "group_n"))


def old_dedup_embedding(spark, sf_dir):
    from flink_release_1_14_5_comment_spark.catalog import register_views
    from flink_release_1_14_5_comment_spark.pipeline.similarity import (
        EMB_DUP_THRESHOLD, _bands_index, _cosine_pre, _norm, _spread)
    t = register_views(spark, sf_dir)
    e = _spread(t["embeddings"])
    idx = _bands_index(e)
    a = idx.withColumnRenamed("vec_id", "id_a")
    b = idx.withColumnRenamed("vec_id", "id_b")
    cand = (a.join(b, ["band", "bucket"])
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b").distinct())
    e_n = e.withColumn("nrm", _norm("embedding"))
    return (cand.join(e_n.select(F.col("vec_id").alias("id_a"),
                                 F.col("embedding").alias("ea"),
                                 F.col("nrm").alias("na_")), "id_a")
            .join(e_n.select(F.col("vec_id").alias("id_b"),
                             F.col("embedding").alias("eb"),
                             F.col("nrm").alias("nb_")), "id_b")
            .withColumn("sim", F.round(_cosine_pre("ea", "eb", "na_", "nb_"), 4))
            .filter(F.col("sim") >= EMB_DUP_THRESHOLD)
            .select("id_a", "id_b", "sim"))


def old_ann_ivf_topk(spark, sf_dir):
    from pyspark.sql import Window as W
    from flink_release_1_14_5_comment_spark.catalog import register_views
    from flink_release_1_14_5_comment_spark.operators.scale import topk_per_key
    from flink_release_1_14_5_comment_spark.pipeline.similarity import (
        N_PROBE, N_QUERIES, _centroids, _cosine_pre, _norm, _spread)
    t = register_views(spark, sf_dir)
    e = _spread(t["embeddings"])
    cent = _centroids(e).withColumn("cnorm", _norm("cent"))
    e_n = e.withColumn("nrm", _norm("embedding"))
    scored = e_n.crossJoin(F.broadcast(cent)).select(
        "vec_id", "cell",
        F.round(_cosine_pre("embedding", "cent", "nrm", "cnorm"), 6).alias("csim"))
    w = W.partitionBy("vec_id").orderBy(F.col("csim").desc(), F.col("cell"))
    ranked = scored.withColumn("rn", F.row_number().over(w)).persist()
    assign = ranked.filter(F.col("rn") == 1).select("vec_id", "cell")
    qcells = (ranked.filter((F.col("vec_id") < N_QUERIES) & (F.col("rn") <= N_PROBE))
              .select(F.col("vec_id").alias("qid"), "cell"))
    cand = (assign.join(F.broadcast(qcells), "cell")
            .filter(F.col("vec_id") != F.col("qid"))
            .select("qid", F.col("vec_id").alias("neighbor_id")).distinct())
    q_vec = e_n.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe"),
        F.col("nrm").alias("qn"))
    sims = (cand.join(F.broadcast(q_vec), "qid")
            .join(e_n.select(F.col("vec_id").alias("neighbor_id"), "embedding", "nrm"),
                  "neighbor_id")
            .select("qid", "neighbor_id",
                    F.round(_cosine_pre("qe", "embedding", "qn", "nrm"), 4).alias("sim")))
    return (topk_per_key(sims, "qid", [F.col("sim").desc(), F.col("neighbor_id")], 3)
            .withColumn("rn", F.col("rn").cast("long")))


def old_multimodal_features(spark, sf_dir):
    import hashlib
    from typing import Iterator
    import pandas as pd
    from flink_release_1_14_5_comment_spark.pipeline.multimodal import (
        _fake_features, synthetic_media)
    out_schema = "media_id long, n_bytes long, sha1 string, features array<double>"

    def extract(batches):
        for pdf in batches:
            content = pdf["content"]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "n_bytes": content.map(len).astype("int64"),
                "sha1": content.map(lambda b: hashlib.sha1(b).hexdigest()),
                "features": content.map(_fake_features),
            })

    feats = synthetic_media(spark, sf_dir).mapInPandas(extract, out_schema)
    return feats.select(
        "media_id", "n_bytes",
        F.round(F.expr("aggregate(features, cast(0.0 as double), (a, v) -> a + v)"), 6).alias("feat_sum"))


def old_embedding_kmeans(spark, sf_dir):
    from flink_release_1_14_5_comment_spark.catalog import register_views
    from flink_release_1_14_5_comment_spark.pipeline.clustering import (
        kmeans_assign, _spread)
    from flink_release_1_14_5_comment_spark.pipeline.similarity import _norm

    def update(assigned):
        rows = (assigned.select("cluster", F.posexplode("embedding").alias("pos", "v"))
                .groupBy("cluster", "pos")
                .agg((F.round(F.sum("v"), 6) / F.count(F.lit(1))).alias("cv"))
                .groupBy("cluster")
                .agg(F.transform(
                    F.sort_array(F.collect_list(F.struct("pos", "cv"))),
                    lambda s: s["cv"]).alias("cent"))
                .collect())
        return [(r["cluster"], list(r["cent"])) for r in rows]

    t = register_views(spark, sf_dir)
    vectors = _spread(t["embeddings"]).select("vec_id", "embedding")
    e = vectors.withColumn("nrm", _norm("embedding")).persist()
    cents = [(int(r["vec_id"]), list(r["embedding"]))
             for r in e.orderBy("vec_id").limit(8)
             .select("vec_id", "embedding").collect()]
    for _ in range(2):
        cents = update(kmeans_assign(e, cents))
    return kmeans_assign(e, cents).select("vec_id", "cluster")


def old_tpch_lit(name):
    def run(spark, sf_dir):
        from flink_release_1_14_5_comment_spark.catalog import register_views
        from flink_release_1_14_5_comment_spark.operators import tpch_literal as tl
        register_views(spark, sf_dir)
        return spark.sql(tl._compose(tl._SPARK_SPEC, tl.TEXTS[name]))
    return run


def old_tpcds_staged(name):
    """HEAD-of-5cf511e behavior: plain _runner_ext over the staged text
    (CTEs inlined per reference by Spark)."""
    def run(spark, sf_dir):
        from flink_release_1_14_5_comment_spark.operators import (
            tpcds_literal as tl)
        return tl._runner_ext(tl._STAGED_ALL[name])(spark, sf_dir)
    return run


def old_tpch_adapted(name):
    def run(spark, sf_dir):
        from flink_release_1_14_5_comment_spark.catalog import register_views
        from flink_release_1_14_5_comment_spark.operators import tpch
        register_views(spark, sf_dir)
        return spark.sql(tpch._SQL[name])
    return run


OLD = {
    "bm25_topk": old_bm25_topk,
    "hybrid_rrf_fusion": old_hybrid_rrf_fusion,
    "ann_pq_topk": old_ann_pq_topk,
    "ann_ivfpq_topk": old_ann_ivfpq_topk,
    "duplicate_spans": old_duplicate_spans,
    "corpus_clean": old_corpus_clean,
    "tpch_lit_q1": old_tpch_lit("tpch_lit_q1"),
    "tpch_lit_q9": old_tpch_lit("tpch_lit_q9"),
    "tpch_lit_q12": old_tpch_lit("tpch_lit_q12"),
    "tpch_q2": old_tpch_adapted("tpch_q2"),
    "tpch_q9": old_tpch_adapted("tpch_q9"),
    "tpcds_lit_q14a": old_tpcds_staged("tpcds_lit_q14a"),
    "tpcds_lit_q14b": old_tpcds_staged("tpcds_lit_q14b"),
    "tpcds_lit_q64": old_tpcds_staged("tpcds_lit_q64"),
    "dedup_simhash": old_dedup_simhash,
    "dedup_embedding": old_dedup_embedding,
    "ann_ivf_topk": old_ann_ivf_topk,
    "multimodal_features": old_multimodal_features,
    "embedding_kmeans": old_embedding_kmeans,
}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*", default=None)
    ap.add_argument("--rounds", type=int, default=4)
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR",
                                                   "/root/testdata/sf0.1"))
    args = ap.parse_args()
    names = args.names or list(OLD)

    import __spark_entry__ as e
    from flink_release_1_14_5_comment_spark.catalog import load_tables
    from flink_release_1_14_5_comment_spark.session import get_spark

    spark = get_spark("ab_compare_r10")
    qs = e.queries()
    for df in load_tables(spark, args.sf).values():
        df.limit(1).count()
    spark.range(64).mapInPandas(lambda it: (p for p in it), "id long").count()

    def run_once(fn) -> float:
        t0 = time.perf_counter()
        fn(spark, args.sf).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    for name in names:
        new_fn, old_fn = qs[name], OLD[name]
        res: dict[str, list[tuple[float, float]]] = {"old": [], "new": []}
        for r in range(args.rounds):
            for tag, fn in (("old", old_fn), ("new", new_fn)):
                spark.catalog.clearCache()
                spark.sparkContext.setJobDescription(f"{name}:{tag}:r{r}")
                fresh = run_once(fn)
                cached = run_once(fn)
                res[tag].append((fresh, cached))
        def fmt(t):
            fr = [x[0] for x in res[t]]
            ca = [x[1] for x in res[t]]
            return (f"fresh min={min(fr):.3f} med={sorted(fr)[len(fr)//2]:.3f} "
                    f"| cached min={min(ca):.3f} med={sorted(ca)[len(ca)//2]:.3f}")
        print(f"{name}:\n  old {fmt('old')}\n  new {fmt('new')}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
