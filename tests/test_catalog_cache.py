"""Catalog caching (VERDICT r3 'what's wrong' #3): load_tables/register_views
must not re-read parquet footers per query — frames are cached per
(session, sf_dir) on the session object."""

from __future__ import annotations

from flink_release_1_14_5_comment_spark.catalog import load_tables, register_views


def test_load_tables_cached_per_session_and_dir(spark, sf_dir):
    a = load_tables(spark, sf_dir)
    b = load_tables(spark, sf_dir)
    # identical DataFrame objects — no new reads, no new plans
    assert all(a[k] is b[k] for k in a)
    # returned dicts are copies: caller mutation must not poison the cache
    b["lineitem"] = None
    c = load_tables(spark, sf_dir)
    assert c["lineitem"] is a["lineitem"]


def test_register_views_skips_reregistration(spark, sf_dir):
    register_views(spark, sf_dir)
    marker = spark._graft_views_for
    register_views(spark, sf_dir)
    assert spark._graft_views_for == marker
    # views resolve after the cached call
    assert spark.table("nation").count() > 0


def test_cache_keyed_by_dir(spark, sf_dir):
    import os

    a = load_tables(spark, sf_dir)
    base = os.path.dirname(os.path.abspath(sf_dir.rstrip("/")))
    others = [os.path.join(base, d) for d in ("sf0.001", "sf0.01")
              if os.path.abspath(os.path.join(base, d)) != os.path.abspath(sf_dir)]
    for other in others[:1]:
        b = load_tables(spark, other)
        assert b["nation"] is not a["nation"]
        # switching back hits the first cache entry again
        assert load_tables(spark, sf_dir)["nation"] is a["nation"]
