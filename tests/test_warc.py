"""WARC source/sink: pure record functions, stream parsing, and the
registered Spark datasource roundtrip (FIXTURES.md §A import/export seam)."""

import glob
import gzip
import io
import os
from datetime import datetime, timezone

import pytest
from pyspark.sql import functions as F

from graph_data_science_spark.sources.warc import (
    WARC_SCHEMA,
    build_response_record,
    build_warcinfo_record,
    _gzip_member,
    parse_warc_stream,
    record_id_for,
    register_warc,
)

TS = datetime(2022, 1, 15, 12, 30, 0)


def _stream(*records: bytes):
    return io.BytesIO(b"".join(records))


# -- pure functions ----------------------------------------------------------

def test_record_roundtrip_single():
    rec = build_response_record("https://a.example/x", TS, b"<html>hi</html>")
    rows = list(parse_warc_stream(_stream(rec)))
    assert rows == [
        (
            "https://a.example/x",
            TS.replace(tzinfo=timezone.utc),
            b"<html>hi</html>",
            record_id_for("https://a.example/x", "2022-01-15T12:30:00Z"),
        )
    ]


def test_non_response_records_skipped():
    info = build_warcinfo_record("f.warc.gz")
    rec = build_response_record("https://a.example/y", TS, b"<p>z</p>")
    rows = list(parse_warc_stream(_stream(info, rec, info)))
    assert [r[0] for r in rows] == ["https://a.example/y"]


def test_digest_verification_catches_corruption():
    rec = bytearray(build_response_record("https://a.example/c", TS, b"payload-bytes"))
    rec[-20] ^= 0xFF  # flip a payload byte, leave headers intact
    with pytest.raises(ValueError, match="digest"):
        list(parse_warc_stream(_stream(bytes(rec))))
    # opting out parses the corrupted record anyway
    rows = list(parse_warc_stream(_stream(bytes(rec)), verify_digest=False))
    assert len(rows) == 1


def test_truncated_body_raises():
    rec = build_response_record("https://a.example/t", TS, b"abcdef")
    with pytest.raises(ValueError, match="truncated"):
        list(parse_warc_stream(_stream(rec[: len(rec) - 30])))


def test_record_bytes_deterministic():
    a = build_response_record("https://a.example/d", TS, b"same")
    b = build_response_record("https://a.example/d", TS, b"same")
    assert a == b
    assert _gzip_member(a) == _gzip_member(b)  # mtime=0: members byte-equal


def test_concatenated_gzip_members_parse_as_one_stream(tmp_path):
    # the Common Crawl layout: one gzip member per record, concatenated
    p = tmp_path / "f.warc.gz"
    recs = [
        build_warcinfo_record("f.warc.gz"),
        build_response_record("https://a.example/1", TS, b"one"),
        build_response_record("https://a.example/2", TS, b"two"),
    ]
    p.write_bytes(b"".join(_gzip_member(r) for r in recs))
    with gzip.open(p, "rb") as fh:
        rows = list(parse_warc_stream(fh))
    assert [r[0] for r in rows] == ["https://a.example/1", "https://a.example/2"]
    assert [bytes(r[2]) for r in rows] == [b"one", b"two"]


# -- Spark datasource --------------------------------------------------------

@pytest.fixture()
def pages(spark):
    rows = [
        (f"https://host{i % 3}.example/p/{i}", TS, f"<html><p>doc {i}</p></html>".encode())
        for i in range(40)
    ]
    return spark.createDataFrame(rows, "url string, warc_ts timestamp, html binary")


def test_write_read_roundtrip(spark, pages, tmp_path):
    register_warc(spark)
    out = str(tmp_path / "warcs")
    pages.repartition(4).write.format("warc").mode("overwrite").save(out)
    files = glob.glob(os.path.join(out, "*.warc.gz"))
    assert len(files) == 4  # one segment file per partition
    back = spark.read.format("warc").load(out)
    assert back.schema == WARC_SCHEMA
    # reader parallelism: one partition per segment file
    assert back.rdd.getNumPartitions() == 4
    got = {
        r["url"]: (r["warc_ts"], bytes(r["html"]))
        for r in back.collect()
    }
    want = {r["url"]: (r["warc_ts"], bytes(r["html"])) for r in pages.collect()}
    assert got == want


def test_overwrite_replaces_previous_files(spark, pages, tmp_path):
    register_warc(spark)
    out = str(tmp_path / "w2")
    pages.repartition(8).write.format("warc").mode("overwrite").save(out)
    assert len(glob.glob(os.path.join(out, "*.warc.gz"))) == 8
    pages.limit(5).repartition(1).write.format("warc").mode("overwrite").save(out)
    assert len(glob.glob(os.path.join(out, "*.warc.gz"))) == 1
    assert spark.read.format("warc").load(out).count() == 5


def test_writer_requires_core_columns(spark, pages, tmp_path):
    register_warc(spark)
    with pytest.raises(Exception, match="warc sink needs columns"):
        pages.drop("html").write.format("warc").mode("overwrite").save(str(tmp_path / "bad"))


def test_single_partition_file_is_byte_deterministic(spark, pages, tmp_path):
    register_warc(spark)
    one = pages.orderBy("url").coalesce(1)
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    one.write.format("warc").mode("overwrite").save(a)
    one.write.format("warc").mode("overwrite").save(b)
    fa = glob.glob(os.path.join(a, "*.warc.gz"))[0]
    fb = glob.glob(os.path.join(b, "*.warc.gz"))[0]
    assert open(fa, "rb").read() == open(fb, "rb").read()


def test_stream_reader_tails_directory(spark, pages, tmp_path):
    """readStream picks up each new segment exactly once across triggers."""
    register_warc(spark)
    src = str(tmp_path / "segments")
    ckpt = str(tmp_path / "ckpt")
    pages.limit(10).repartition(2).write.format("warc").mode("append").save(src)
    q = (
        spark.readStream.format("warc")
        .load(src)
        .writeStream.format("memory")
        .queryName("warc_stream_sink")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        first = {r["url"] for r in spark.table("warc_stream_sink").collect()}
        assert len(first) == 10
        # a new segment lands: ONLY its records arrive (no re-read of wave 1)
        pages.limit(15).repartition(1).write.format("warc").mode("append").save(src)
        q.processAllAvailable()
        rows = spark.table("warc_stream_sink").collect()
        assert len(rows) == 10 + 15  # 15 new rows, none of wave 1 duplicated
        assert len({r["url"] for r in rows} ) == 15  # urls overlap by design
    finally:
        q.stop()


def test_append_mode_accumulates_segments(spark, pages, tmp_path):
    register_warc(spark)
    out = str(tmp_path / "acc")
    pages.repartition(2).write.format("warc").mode("append").save(out)
    pages.repartition(2).write.format("warc").mode("append").save(out)
    assert len(glob.glob(os.path.join(out, "*.warc.gz"))) == 4
    assert spark.read.format("warc").load(out).count() == 80


def test_warc_feeds_link_graph(spark, tmp_path):
    """The import seam composes: WARC -> extract links -> edge build."""
    from graph_data_science_spark.sources.edges import build_link_graph

    register_warc(spark)
    html = '<html><body><a href="https://h.example/b">x</a></body></html>'
    rows = [
        ("https://h.example/a", TS, html.encode()),
        ("https://h.example/b", TS, b"<html><body>leaf</body></html>"),
    ]
    df = spark.createDataFrame(rows, "url string, warc_ts timestamp, html binary")
    out = str(tmp_path / "seam")
    df.write.format("warc").mode("overwrite").save(out)
    back = spark.read.format("warc").load(out)
    g = build_link_graph(back)
    assert g.edges.count() == 1
    assert g.nodes.count() == 2
