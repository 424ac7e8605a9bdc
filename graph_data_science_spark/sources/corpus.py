"""Deterministic synthetic Common-Crawl-style web page corpus.

Schema per BASELINE.json input_hint:
  web_pages(url string, warc_ts timestamp, html binary, text string, lang string)

Generation is **seeded and partition-stable** — every random quantity is a
pure function of (id, k, seed) via xxhash64, never of partitioning or
scheduling (the analog of the reference's seeded RandomGraphGenerator,
core/src/main/java/org/neo4j/gds/beta/generator/RandomGraphGenerator.java:96-99).

Link structure (FIXTURES.md §A):
- out-link counts follow a power law (inverse-CDF on a seeded uniform,
  mirroring RelationshipDistribution.POWER_LAW,
  core/.../beta/generator/RelationshipDistribution.java:59-72) plus forced
  mega-hubs for skew testing;
- target skew: a fraction of links point at low ids (u^3 bias) creating
  high in-degree hubs;
- some hrefs dangle (non-corpus urls -> dropped at the id-map inner join);
- duplicate hrefs per page (dedup = Aggregation.SINGLE) and occasional
  self-links (triangle counting must ignore).

Everything except final text extraction is JVM-side column expressions; the
`text` column is produced by the SAME extract_text code path users run
(sources/extract.py), keeping the byte-identical invariant by construction.
"""

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graph_data_science_spark.sources.extract import extract_text_udf

EPOCH = 1640995200  # 2022-01-01, deterministic warc_ts base

LANGS = ["en", "en", "en", "en", "en", "en", "de", "fr", "es", "it"]


@dataclass
class CorpusConfig:
    n_pages: int = 1000
    avg_degree: float = 12.0
    n_hosts: int = 100
    seed: int = 42
    mega_hubs: int = 3  # first ids get huge out-degree (skew testing)
    dangling_mod: int = 37  # 1/37 of links point outside the corpus
    self_mod: int = 53  # 1/53 of links are self-links
    dup_mod: int = 11  # 1/11 of links are emitted twice (duplicate hrefs)
    max_degree_cap: int = 4096


def _u(col, lo=0.0, hi=1.0):
    """Deterministic uniform in [lo, hi) from a hash column."""
    return (F.pmod(col, F.lit(2**31)) / F.lit(float(2**31))) * (hi - lo) + lo


def page_url(id_col, n_hosts: int):
    return F.concat(
        F.lit("https://host"),
        F.pmod(id_col, F.lit(n_hosts)).cast("string"),
        F.lit(".example.org/page/"),
        id_col.cast("string"),
    )


def synth_web_pages(spark: SparkSession, cfg: CorpusConfig | None = None) -> DataFrame:
    cfg = cfg or CorpusConfig()
    n = cfg.n_pages

    df = spark.range(n).withColumnRenamed("id", "page_id")
    pid = F.col("page_id")

    # power-law out-degree via inverse CDF: deg = floor(c * u^(-1/2)), capped;
    # mean ≈ 2c for small caps -> c = avg_degree / 2
    u_deg = _u(F.xxhash64(pid, F.lit("deg"), F.lit(cfg.seed)))
    c = cfg.avg_degree / 2.0
    deg = F.least(
        F.lit(cfg.max_degree_cap),
        F.floor(F.lit(c) * F.pow(u_deg + F.lit(1e-9), F.lit(-0.5))),
    )
    deg = F.when(pid < cfg.mega_hubs, F.lit(min(max(n // 20, 8), 5000))).otherwise(deg)
    df = df.withColumn("out_deg", deg.cast("int"))

    # link targets: k-indexed, each a pure function of (page_id, k, seed)
    ks = F.sequence(F.lit(0), F.col("out_deg") - 1)

    def target_expr(k):
        h = F.xxhash64(pid, k, F.lit(cfg.seed), F.lit("tgt"))
        u = _u(F.xxhash64(h, F.lit("u")))
        skewed = F.floor(F.lit(float(n)) * F.pow(u, F.lit(3.0)))  # low-id hub bias
        uniform = F.floor(F.lit(float(n)) * u)
        tgt = F.when(F.pmod(h, F.lit(10)) < 3, skewed).otherwise(uniform)
        tgt = F.when(F.pmod(h, F.lit(cfg.self_mod)) == 0, pid).otherwise(tgt)
        # dangling: out-of-corpus id -> url that will not join
        tgt = F.when(
            F.pmod(h, F.lit(cfg.dangling_mod)) == 1, F.lit(n) + F.pmod(h, F.lit(997))
        ).otherwise(tgt)
        return tgt

    df = df.withColumn("targets", F.transform(ks, target_expr))
    # duplicate hrefs: repeat targets whose (id,k) hash says so
    dup = F.filter(
        F.transform(
            ks,
            lambda k: F.when(
                F.pmod(F.xxhash64(pid, k, F.lit(cfg.seed), F.lit("dup")), F.lit(cfg.dup_mod))
                == 0,
                F.element_at(F.col("targets"), k.cast("int") + 1),
            ),
        ),
        lambda x: x.isNotNull(),
    )
    df = df.withColumn("targets", F.concat(F.col("targets"), dup))

    anchors = F.array_join(
        F.transform(
            F.col("targets"),
            lambda t, i: F.concat(
                F.lit('<li><a href="'),
                page_url(t, cfg.n_hosts),
                F.lit('">link '),
                i.cast("string"),
                F.lit("</a></li>"),
            ),
        ),
        "",
    )

    title = F.concat(F.lit("Page "), pid.cast("string"), F.lit(" of the synthetic crawl"))
    body_words = F.array_join(
        F.transform(
            F.sequence(F.lit(0), F.pmod(F.xxhash64(pid, F.lit("len")), F.lit(40)) + 10),
            lambda i: F.concat(
                F.lit("word"),
                F.pmod(F.xxhash64(pid, i, F.lit(cfg.seed), F.lit("w")), F.lit(5000)).cast(
                    "string"
                ),
            ),
        ),
        " ",
    )
    html_str = F.concat(
        F.lit("<html><head><title>"),
        title,
        F.lit("</title></head><body><h1>"),
        title,
        F.lit("</h1><p>"),
        body_words,
        F.lit("</p><ul>"),
        anchors,
        F.lit("</ul></body></html>"),
    )

    lang = F.element_at(
        F.array(*[F.lit(l) for l in LANGS]),
        (F.pmod(F.xxhash64(pid, F.lit("lang"), F.lit(cfg.seed)), F.lit(len(LANGS))) + 1).cast(
            "int"
        ),
    )
    warc_ts = F.timestamp_seconds(F.lit(EPOCH) + F.pmod(pid * 7919, F.lit(30 * 86400)))

    pages = df.select(
        page_url(pid, cfg.n_hosts).alias("url"),
        warc_ts.alias("warc_ts"),
        F.encode(html_str, "UTF-8").alias("html"),
        lang.alias("lang"),
    )
    return pages.withColumn("text", extract_text_udf(F.decode("html", "UTF-8"))).select(
        "url", "warc_ts", "html", "text", "lang"
    )


def _hex6(key) -> "F.Column":
    """First-6-hex-chars of md5(key) as a long in [0, 16^6) — the seeded RNG
    whose arithmetic an ANSI-SQL oracle replays exactly (unlike xxhash64)."""
    return F.conv(F.substring(F.md5(key), 1, 6), 16, 10).cast("long")


def web_pages_from_documents(docs: DataFrame, avg_degree: float = 8.0, seed: int = 42) -> DataFrame:
    """Deterministic web_pages derived from the testdata `documents` table:
    urls keyed by doc_id, html embeds the (entity-escaped) document text plus
    seeded link structure over the doc_id space.  Used by the driver entry
    flagship query so the full html->links->graph path runs over testdata.

    Every random quantity is md5-hex-prefix arithmetic on (doc_id, k, seed),
    so the correctness oracle rebuilds the same edge list in DuckDB and
    replays the full pipeline end-to-end (CORRECTNESS `corpus_pagerank`)."""
    n = docs.count()
    doc_id = F.col("doc_id").cast("long")
    url = F.concat(F.lit("https://corpus.example.org/doc/"), doc_id.cast("string"))

    M = float(16**6)
    u_deg = _hex6(F.concat_ws(":", doc_id.cast("string"), F.lit("deg"), F.lit(str(seed)))) / M
    deg = F.least(
        F.lit(64),
        F.floor(F.lit(avg_degree / 2.0) * F.pow(u_deg + F.lit(1e-9), F.lit(-0.5))),
    ).cast("int")

    def target_expr(k):
        ks = k.cast("string")
        h = _hex6(F.concat_ws(":", doc_id.cast("string"), ks, F.lit("tgt"), F.lit(str(seed))))
        u = _hex6(F.concat_ws(":", doc_id.cast("string"), ks, F.lit("u"), F.lit(str(seed)))) / M
        skewed = F.floor(F.lit(float(n)) * F.pow(u, F.lit(3.0)))
        return F.when(F.pmod(h, F.lit(5)) < 2, skewed).otherwise(F.floor(F.lit(float(n)) * u))

    anchors = F.array_join(
        F.transform(
            F.sequence(F.lit(0), deg - 1),
            lambda k, i: F.concat(
                F.lit('<li><a href="https://corpus.example.org/doc/'),
                target_expr(k).cast("string"),
                F.lit('">ref '),
                i.cast("string"),
                F.lit("</a></li>"),
            ),
        ),
        "",
    )

    esc = F.regexp_replace(
        F.regexp_replace(F.regexp_replace(F.col("text"), "&", "&amp;"), "<", "&lt;"),
        ">",
        "&gt;",
    )
    html_str = F.concat(
        F.lit("<html><head><title>Doc "),
        doc_id.cast("string"),
        F.lit("</title></head><body><p>"),
        esc,
        F.lit("</p><ul>"),
        anchors,
        F.lit("</ul></body></html>"),
    )
    pages = docs.select(
        url.alias("url"),
        F.timestamp_seconds(F.lit(EPOCH) + doc_id).alias("warc_ts"),
        F.encode(html_str, "UTF-8").alias("html"),
        F.col("lang"),
    )
    return pages.withColumn("text", extract_text_udf(F.decode("html", "UTF-8"))).select(
        "url", "warc_ts", "html", "text", "lang"
    )
