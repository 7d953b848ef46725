"""Pipeline operator tests beyond the oracle gate: multimodal plumbing and
dedup/similarity invariants."""

from __future__ import annotations

import hashlib
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

from flink_release_1_14_5_comment_spark.pipeline.multimodal import (
    decode_image,
    extract_features,
    frame_sample,
    synthetic_media,
    N_FEATURES,
)
from flink_release_1_14_5_comment_spark.pipeline.dedup import (
    minhash_signatures,
    shingle_docs,
    shingle_frame,
)


def test_multimodal_extract_features(spark, sf_dir):
    media = synthetic_media(spark, sf_dir)
    feats = extract_features(media)
    row = feats.orderBy("media_id").first()
    src = media.orderBy("media_id").first()
    content = bytes(src["content"])
    assert row["n_bytes"] == len(content)
    assert row["sha1"] == hashlib.sha1(content).hexdigest()
    assert len(row["features"]) == N_FEATURES
    assert all(0.0 <= v < 1.0 for v in row["features"])
    expected = [b / 255.0 for b in hashlib.md5(content).digest()[:N_FEATURES]]
    assert row["features"] == pytest.approx(expected)


def test_multimodal_decode_is_stubbed():
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG")


def test_multimodal_frame_sample(spark, sf_dir):
    media = synthetic_media(spark, sf_dir).limit(10)
    frames = frame_sample(media)
    pdf = frames.toPandas()
    assert set(pdf.columns) == {"media_id", "frame_idx", "frame"}
    assert (pdf.groupby("media_id")["frame_idx"].min() == 0).all()
    assert pdf["frame"].map(len).max() <= 64


def test_minhash_signature_shape(spark, sf_dir):
    sig = minhash_signatures(shingle_docs(spark, sf_dir))
    pdf = sig.toPandas()
    assert set(pdf["band"]) == {0, 1, 2, 3}
    # one signature row per (doc, band)
    assert not pdf.duplicated(["doc_id", "band"]).any()
    from flink_release_1_14_5_comment_spark.pipeline.dedup import _MINHASH_P

    for c in ("s0", "s1"):
        assert (pdf[c] >= 0).all() and (pdf[c] < _MINHASH_P).all()


def test_identical_docs_are_minhash_candidates(spark, sf_dir):
    """A doc duplicated verbatim must collide on every band."""
    from flink_release_1_14_5_comment_spark.catalog import load_tables

    docs = load_tables(spark, sf_dir)["documents"].limit(5)
    dup = docs.withColumn("doc_id", F.col("doc_id") + 1_000_000)
    sig = minhash_signatures(shingle_frame(docs.union(dup)))
    pdf = sig.toPandas()
    for (doc, band), grp in pdf.groupby(["doc_id", "band"]):
        twin = doc + 1_000_000 if doc < 1_000_000 else doc - 1_000_000
        twin_sig = pdf[(pdf.doc_id == twin) & (pdf.band == band)]
        assert len(twin_sig) == 1
        assert twin_sig["s0"].iloc[0] == grp["s0"].iloc[0]
        assert twin_sig["s1"].iloc[0] == grp["s1"].iloc[0]


def test_multimodal_resize(spark, sf_dir):
    from flink_release_1_14_5_comment_spark.pipeline.multimodal import (
        resize_image, synthetic_media,
    )

    media = synthetic_media(spark, sf_dir).limit(20)
    out = resize_image(media, 128, 64)
    rows = out.collect()
    assert len(rows) == 20
    assert all(r.width == 128 and r.height == 64 for r in rows)
    assert all(len(r.resized) == (128 * 64) // 64 for r in rows)
    # deterministic fake: same input -> same bytes
    again = {r.media_id: bytes(r.resized) for r in resize_image(media, 128, 64).collect()}
    assert all(bytes(r.resized) == again[r.media_id] for r in rows)


def test_semantic_multiprobe_is_superset(spark, sf_dir):
    """Multi-probe candidates strictly contain the single-assignment ones:
    every within-cell pair shares its members' best cells, which both
    probes retain — so probing more cells can only ADD pairs (the recall
    direction the docstring claims)."""
    from flink_release_1_14_5_comment_spark.pipeline import clustering

    single = {(r.id_a, r.id_b)
              for r in clustering.q_dedup_semantic(spark, sf_dir).collect()}
    multi = {(r.id_a, r.id_b)
             for r in clustering.q_dedup_semantic_multiprobe(
                 spark, sf_dir).collect()}
    assert single <= multi
