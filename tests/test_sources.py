"""Corpus synthesis, byte-identical extraction invariant, graph build,
and catalog round-trips (FIXTURES.md §A)."""

import pyspark.sql.functions as F
import pytest

from graph_data_science_spark.sources.catalog import GraphCatalog
from graph_data_science_spark.sources.corpus import CorpusConfig, synth_web_pages
from graph_data_science_spark.sources.edges import (
    build_id_map,
    build_link_graph,
    extract_link_pairs,
)
from graph_data_science_spark.sources.extract import (
    extract_links,
    extract_links_udf,
    extract_text,
    extract_text_udf,
)


class TestExtract:
    def test_text_strip_and_entities(self):
        html = b"<html><body><h1>Hi &amp; bye</h1><p>a  b\nc</p><script>var x=1;</script></body></html>"
        assert extract_text(html) == "Hi & bye a b c"

    def test_links_resolution(self):
        html = (
            '<a href="https://x.org/abs">A</a> <a href="/root">B</a> '
            '<a href="rel/page">C</a> <a href="#frag">D</a> <a href="mailto:x@y">E</a>'
        )
        links = extract_links(html, "https://host.example.org/dir/page")
        assert links == [
            "https://x.org/abs",
            "https://host.example.org/root",
            "https://host.example.org/dir/rel/page",
        ]

    def test_duplicates_preserved(self):
        html = '<a href="https://x.org/a">1</a><a href="https://x.org/a">2</a>'
        assert extract_links(html, "https://y.org/") == ["https://x.org/a"] * 2


class TestByteIdenticalInvariant:
    """input_hint: byte-identical extracted text per url, plain-Python loop
    (the reference extractor) vs the Arrow pandas_udf path."""

    def test_text_udf_matches_pure_loop(self, spark):
        pages = synth_web_pages(spark, CorpusConfig(n_pages=200)).cache()
        rows = pages.select("url", F.decode("html", "UTF-8").alias("h"), "text").collect()
        for r in rows:
            oracle = extract_text(r["h"])
            assert oracle.encode("utf-8") == r["text"].encode("utf-8"), r["url"]

    def test_links_udf_matches_pure_loop(self, spark):
        pages = synth_web_pages(spark, CorpusConfig(n_pages=100))
        got = pages.select(
            "url",
            extract_links_udf(F.decode("html", "UTF-8"), F.col("url")).alias("links"),
            F.decode("html", "UTF-8").alias("h"),
        ).collect()
        for r in got:
            assert list(r["links"]) == extract_links(r["h"], r["url"]), r["url"]


class TestCorpus:
    def test_deterministic_across_runs_and_partitioning(self, spark):
        a = synth_web_pages(spark, CorpusConfig(n_pages=300)).orderBy("url").collect()
        b = (
            synth_web_pages(spark, CorpusConfig(n_pages=300))
            .repartition(7)
            .orderBy("url")
            .collect()
        )
        assert [r["url"] for r in a] == [r["url"] for r in b]
        assert [r["text"] for r in a] == [r["text"] for r in b]
        assert [bytes(r["html"]) for r in a] == [bytes(r["html"]) for r in b]

    def test_schema_and_skew(self, spark):
        pages = synth_web_pages(spark, CorpusConfig(n_pages=500)).cache()
        assert pages.columns == ["url", "warc_ts", "html", "text", "lang"]
        assert dict(pages.dtypes)["html"] == "binary"
        assert dict(pages.dtypes)["warc_ts"] == "timestamp"
        assert pages.count() == 500
        g = build_link_graph(pages)
        deg = g.degrees()
        top = deg.orderBy(F.desc("degree")).limit(1).collect()[0]["degree"]
        avg = deg.agg(F.avg("degree")).collect()[0][0]
        assert top > 5 * avg  # mega-hub skew present


class TestGraphBuild:
    def test_id_map_dense_and_deterministic(self, spark):
        pages = synth_web_pages(spark, CorpusConfig(n_pages=150))
        ids = build_id_map(pages).collect()
        assert sorted(r["id"] for r in ids) == list(range(150))
        by_url = sorted(ids, key=lambda r: r["url"])
        assert [r["id"] for r in by_url] == list(range(150))

    def test_dangling_links_dropped_and_single_dedup(self, spark):
        pages = synth_web_pages(spark, CorpusConfig(n_pages=200)).cache()
        g = build_link_graph(pages)
        n = g.node_count()
        assert n == 200
        # all edge endpoints are valid dense ids
        mx = g.edges.agg(F.max("src"), F.max("dst")).collect()[0]
        assert mx[0] < n and mx[1] < n
        # SINGLE dedup: no duplicate (src,dst)
        assert g.edges.count() == g.edges.select("src", "dst").distinct().count()
        # duplicates existed pre-dedup
        pairs = extract_link_pairs(pages)
        assert pairs.count() > pairs.distinct().count()

    def test_salted_hub_join_parity_and_spread(self, spark):
        from graph_data_science_spark.sources.edges import salted_hub_join

        # probe: 2000 rows pointing at hub href 'H' + 50 light rows; build:
        # one id per href.  Salted join must equal the plain join exactly,
        # and the hub's probe rows must land in >1 shuffle partition.
        probe = spark.range(2000).select(
            F.concat(F.lit("src"), "id").alias("url"), F.lit("H").alias("href")
        ).unionByName(
            spark.range(50).select(
                F.concat(F.lit("s"), "id").alias("url"),
                F.concat(F.lit("L"), "id").alias("href"),
            )
        )
        build = (
            probe.select("href").distinct()
            .withColumn("dst", F.xxhash64("href"))
        )
        plain = probe.join(build, "href").select("url", "dst")
        salted = salted_hub_join(probe, build, "href", hub_threshold=100, buckets=8)
        assert sorted(map(tuple, salted.select("url", "dst").collect())) == sorted(
            map(tuple, plain.collect())
        )
        spread = (
            salted_hub_join(probe, build, "href", hub_threshold=100, buckets=8)
            .where(F.col("href") == "H")
            .select(F.spark_partition_id().alias("p"))
            .distinct()
            .count()
        )
        assert spread > 1

    def test_build_link_graph_salted_matches_plain(self, spark):
        pages = synth_web_pages(spark, CorpusConfig(n_pages=200)).cache()
        plain = build_link_graph(pages, hub_salt_threshold=None)
        # threshold 1: every href is "heavy" -> maximal salting, same edges
        salted = build_link_graph(pages, hub_salt_threshold=1, salt_buckets=4)
        a = sorted(map(tuple, plain.edges.select("src", "dst").collect()))
        b = sorted(map(tuple, salted.edges.select("src", "dst").collect()))
        assert a == b

    def test_catalog_roundtrip(self, spark, tmp_path):
        pages = synth_web_pages(spark, CorpusConfig(n_pages=80))
        g = build_link_graph(pages)
        cat = GraphCatalog(spark, str(tmp_path / "catalog"))
        mf = cat.save("web", g)
        assert cat.exists("web")
        assert mf["node_count"] == 80
        g2 = cat.load("web")
        assert g2.relationship_count() == g.relationship_count()
        assert [m["name"] for m in cat.list()] == ["web"]
        assert cat.drop("web") and not cat.exists("web")
