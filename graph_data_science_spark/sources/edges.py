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


def build_link_graph(pages: DataFrame, id_map: DataFrame | None = None) -> LinkGraph:
    """pages(url, warc_ts, html, text, lang) -> LinkGraph.

    - dangling hrefs (no matching corpus url) are dropped by the inner join;
    - (src,dst) pairs are deduped = Aggregation.SINGLE semantics;
    - nodes carry the original `url` as a property (toOriginalNodeId analog).
    """
    if id_map is None:
        id_map = build_id_map(pages)
    id_map = id_map.cache()

    pairs = extract_link_pairs(pages)
    src_ids = id_map.select(F.col("url"), F.col("id").alias("src"))
    dst_ids = id_map.select(F.col("url").alias("href"), F.col("id").alias("dst"))
    edges = (
        pairs.join(src_ids, "url")
        .join(dst_ids, "href")  # inner: dangling links dropped
        .select("src", "dst")
        .distinct()  # Aggregation.SINGLE
        .withColumn("weight", F.lit(1.0))
    )
    nodes = id_map.select("id", "url")
    return LinkGraph(nodes=nodes, edges=edges)
