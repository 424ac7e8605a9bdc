"""Graph construction from web pages — the `gds.graph.project` analog.

Reference lifecycle (SURVEY.md §3.1): parallel store scan -> dense IdMap ->
adjacency compression -> catalog registration.  Spark trace: read pages ->
extract links (Arrow UDF) -> deterministic dense id assignment -> href->id
inner join (drops dangling links) -> (src,dst) dedup (Aggregation.SINGLE).

Id assignment: dense ids `[0, nodeCount)` ordered by url (IdMap analog,
core/src/main/java/org/neo4j/gds/api/IdMap.java:31).  Implemented as a
distributed sort + zipWithIndex — NOT row_number over a global window, which
would funnel every row through one partition at 10^12-document scale.
"""

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from graph_data_science_spark.operators.graph import LinkGraph
from graph_data_science_spark.sources.extract import extract_links_udf


def build_id_map(pages: DataFrame) -> DataFrame:
    """url -> dense id [0, n), deterministic (ordered by url)."""
    spark = pages.sparkSession
    schema = T.StructType(
        [
            T.StructField("url", T.StringType(), False),
            T.StructField("id", T.LongType(), False),
        ]
    )
    rdd = (
        pages.select("url")
        .distinct()
        .orderBy("url")  # distributed range-partitioned sort
        .rdd.map(lambda r: r["url"])
        .zipWithIndex()
        .map(lambda t: (t[0], t[1]))
    )
    return spark.createDataFrame(rdd, schema=schema)


def extract_link_pairs(pages: DataFrame) -> DataFrame:
    """(url, href) pairs — one row per anchor, duplicates preserved."""
    return pages.select(
        "url", F.explode(extract_links_udf(F.decode("html", "UTF-8"), F.col("url"))).alias("href")
    )


def salted_hub_join(
    probe: DataFrame,
    build: DataFrame,
    key: str,
    hub_threshold: int = 1_000_000,
    buckets: int = 32,
) -> DataFrame:
    """Inner join with EXPLICIT differentiated salting for hub skew.

    A mega-hub href (pointed at by a large fraction of the corpus) funnels
    its entire probe row group through ONE reducer of a plain key join.  AQE
    skew-join splits oversized partitions at runtime, but only within what
    one map stage produced; the north rule asks for explicit salted
    repartitioning, which also covers the non-AQE / streaming-shuffle cases:

    1. heavy keys = probe-side frequency > hub_threshold (one aggregation;
       by definition of "hub" this set is small, so it broadcasts);
    2. probe rows of heavy keys get salt = xxhash64(row nonce) % buckets —
       spreading each hub across `buckets` reducers; light rows salt 0;
    3. build rows of heavy keys are replicated once per bucket (bounded:
       |heavy| x buckets extra rows, NEVER a full build-side blowup);
       light rows keep salt 0;
    4. equi-join on (key, salt) — identical result set to the plain join.
    """
    heavy = (
        probe.groupBy(key)
        .count()
        .where(F.col("count") > hub_threshold)
        .select(key, F.lit(True).alias("_heavy"))
    )
    # deterministic row salt (task-retry safe): hash of the probe row's own
    # columns — a hub's probe rows differ in their other columns, so the hub
    # spreads across buckets; identical duplicate rows share a bucket, which
    # only matters if the duplicates ARE the skew (not the hub pattern).
    row_hash = F.xxhash64(*[F.col(c) for c in probe.columns])
    salted_probe = (
        probe.join(F.broadcast(heavy), key, "left")
        .withColumn(
            "_salt",
            F.when(
                F.col("_heavy").isNotNull(), F.pmod(row_hash, F.lit(buckets))
            ).otherwise(F.lit(0)),
        )
        .drop("_heavy")
    )
    salted_build = (
        build.join(F.broadcast(heavy), key, "left")
        .withColumn(
            "_salts",
            F.when(
                F.col("_heavy").isNotNull(),
                F.sequence(F.lit(0), F.lit(buckets - 1)),
            ).otherwise(F.array(F.lit(0))),
        )
        .withColumn("_salt", F.explode("_salts"))
        .drop("_heavy", "_salts")
    )
    return salted_probe.join(salted_build, [key, "_salt"]).drop("_salt")


def build_link_graph(
    pages: DataFrame,
    id_map: DataFrame | None = None,
    hub_salt_threshold: int | None = 1_000_000,
    salt_buckets: int = 32,
) -> LinkGraph:
    """pages(url, warc_ts, html, text, lang) -> LinkGraph.

    - dangling hrefs (no matching corpus url) are dropped by the inner join;
    - (src,dst) pairs are deduped = Aggregation.SINGLE semantics;
    - nodes carry the original `url` as a property (toOriginalNodeId analog);
    - the href->id join (the hub-skewed side: every link TO a mega-hub is one
      probe row with the hub's href) goes through salted_hub_join when
      `hub_salt_threshold` is set — pass None to fall back to the plain join
      (AQE skew-split only).
    """
    if id_map is None:
        id_map = build_id_map(pages)
    id_map = id_map.cache()

    pairs = extract_link_pairs(pages)
    src_ids = id_map.select(F.col("url"), F.col("id").alias("src"))
    dst_ids = id_map.select(F.col("url").alias("href"), F.col("id").alias("dst"))
    with_src = pairs.join(src_ids, "url")
    if hub_salt_threshold is not None:
        with_dst = salted_hub_join(
            with_src, dst_ids, "href", hub_salt_threshold, salt_buckets
        )
    else:
        with_dst = with_src.join(dst_ids, "href")  # inner: dangling dropped
    edges = (
        with_dst.select("src", "dst")
        .distinct()  # Aggregation.SINGLE
        .withColumn("weight", F.lit(1.0))
    )
    nodes = id_map.select("id", "url")
    return LinkGraph(nodes=nodes, edges=edges)
