"""WARC (ISO 28500) source + sink as a registered Spark data source.

Common Crawl — the corpus the north rule's web pages are "style"d on — ships
as WARC: one gzip member per record, members concatenated into ~1 GB segment
files.  This module makes that format a first-class Spark source/sink via the
Python DataSource API (Spark 4, `pyspark.sql.datasource`):

    register_warc(spark)
    pages.write.format("warc").mode("overwrite").save(path)      # sink
    spark.read.format("warc").load(path)                         # source
    spark.readStream.format("warc").load(path)                   # stream (tail)
        -> (url string, warc_ts timestamp, html binary, record_id string)

Reference parity: the reference engine ingests graphs from Neo4j store files
and CSV (csv/src/main/java/org/neo4j/gds/core/io/file/csv/CsvGraphStoreImporter.java);
the WARC source is the web-corpus analog of that import seam — it feeds
`sources/edges.py build_link_graph` exactly like the parquet pages table does.

Scale story (100 TB): a Common-Crawl snapshot is ~80k segment files; the
reader exposes ONE InputPartition PER FILE, so a 1000-executor cluster reads
segments in parallel with no coordination, and each partition STREAMS records
out of the gzip stream (constant memory — no whole-file or whole-record-list
buffering).  Rows cross into the JVM Arrow-batched (the datasource runtime
batches the iterator); the html payload stays an opaque binary column for
`extract.py`'s vectorized UDFs.  The writer emits one gzip-member-per-record
file per partition (the Common Crawl layout), so a rewritten corpus keeps the
same parallel-read property.

Determinism: record ids are md5-derived from (url, date), gzip headers carry
mtime=0 and no filename, and the per-file warcinfo preamble is constant — two
writes of the same partition produce byte-identical files (asserted in
tests/test_warc.py).
"""

from __future__ import annotations

import base64
import gzip
import hashlib
import io
import os
import uuid
from dataclasses import dataclass
from datetime import datetime, timezone
from typing import Iterator, Tuple

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)
from pyspark.sql.types import (
    BinaryType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

WARC_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("warc_ts", TimestampType()),
        StructField("html", BinaryType()),
        StructField("record_id", StringType()),
    ]
)

_DATE_FMT = "%Y-%m-%dT%H:%M:%SZ"
_WARCINFO_DATE = "2022-01-01T00:00:00Z"  # constant: files stay byte-deterministic
_CRLF = b"\r\n"


# --------------------------------------------------------------------------
# record construction (pure functions — unit-testable without Spark)
# --------------------------------------------------------------------------

def record_id_for(url: str, date: str) -> str:
    """Deterministic RFC-4122-shaped record id: md5(url|date) as a UUID."""
    digest = hashlib.md5(f"{url}|{date}".encode()).digest()
    return f"<urn:uuid:{uuid.UUID(bytes=digest)}>"


def _payload_digest(body: bytes) -> str:
    """Common Crawl convention: sha1, base32 (RFC 3548) — e.g.
    ``sha1:3I42H3S6NNFQ2MSVX7XZKYAYSCX5QBYJ``."""
    return "sha1:" + base64.b32encode(hashlib.sha1(body).digest()).decode()


def build_response_record(url: str, ts: datetime, html: bytes) -> bytes:
    """One WARC/1.0 response record (uncompressed bytes): WARC headers, an
    HTTP/1.1 response envelope, the html payload, and the two-CRLF trailer."""
    if ts.tzinfo is not None:
        ts = ts.astimezone(timezone.utc).replace(tzinfo=None)
    date = ts.strftime(_DATE_FMT)
    http = (
        b"HTTP/1.1 200 OK\r\n"
        b"Content-Type: text/html; charset=UTF-8\r\n"
        b"Content-Length: " + str(len(html)).encode() + b"\r\n\r\n" + html
    )
    headers = (
        b"WARC/1.0\r\n"
        b"WARC-Type: response\r\n"
        b"WARC-Record-ID: " + record_id_for(url, date).encode() + _CRLF
        + b"WARC-Date: " + date.encode() + _CRLF
        + b"WARC-Target-URI: " + url.encode() + _CRLF
        + b"WARC-Payload-Digest: " + _payload_digest(html).encode() + _CRLF
        + b"Content-Type: application/http; msgtype=response\r\n"
        + b"Content-Length: " + str(len(http)).encode() + b"\r\n\r\n"
    )
    return headers + http + _CRLF + _CRLF


def build_warcinfo_record(filename: str) -> bytes:
    body = b"software: graph-data-science-spark warc sink\r\nformat: WARC File Format 1.0\r\n"
    headers = (
        b"WARC/1.0\r\n"
        b"WARC-Type: warcinfo\r\n"
        b"WARC-Record-ID: " + record_id_for(filename, _WARCINFO_DATE).encode() + _CRLF
        + b"WARC-Date: " + _WARCINFO_DATE.encode() + _CRLF
        + b"WARC-Filename: " + filename.encode() + _CRLF
        + b"Content-Type: application/warc-fields\r\n"
        + b"Content-Length: " + str(len(body)).encode() + b"\r\n\r\n"
    )
    return headers + body + _CRLF + _CRLF


def _gzip_member(raw: bytes) -> bytes:
    """One deterministic gzip member (mtime=0, no filename)."""
    buf = io.BytesIO()
    with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
        gz.write(raw)
    return buf.getvalue()


# --------------------------------------------------------------------------
# stream parsing (generator — constant memory per record)
# --------------------------------------------------------------------------

def _read_headers(stream) -> dict | None:
    """Read one WARC header block; None at clean EOF.  Leading blank lines
    (record trailers) are consumed."""
    line = stream.readline()
    while line in (_CRLF, b"\n"):
        line = stream.readline()
    if not line:
        return None
    version = line.strip()
    if not version.startswith(b"WARC/"):
        raise ValueError(f"expected WARC version line, got {version[:40]!r}")
    headers: dict = {}
    while True:
        line = stream.readline()
        if not line or line in (_CRLF, b"\n"):
            break
        k, _, v = line.partition(b":")
        headers[k.strip().lower().decode()] = v.strip().decode()
    return headers


def parse_warc_stream(
    stream, verify_digest: bool = True
) -> Iterator[Tuple[str, datetime, bytes, str]]:
    """Yield (url, ts, html, record_id) for every *response* record in a
    decompressed WARC byte stream; warcinfo/request/metadata records are
    consumed and skipped (Common Crawl segments interleave all three)."""
    while True:
        headers = _read_headers(stream)
        if headers is None:
            return
        length = int(headers.get("content-length", "0"))
        body = stream.read(length)
        if len(body) != length:
            raise ValueError("truncated WARC record body")
        if headers.get("warc-type") != "response":
            continue
        url = headers.get("warc-target-uri", "")
        ts = datetime.strptime(headers.get("warc-date"), _DATE_FMT).replace(
            tzinfo=timezone.utc
        )
        # HTTP envelope: payload starts after the first blank line
        sep = body.find(b"\r\n\r\n")
        html = body[sep + 4 :] if sep >= 0 else body
        digest = headers.get("warc-payload-digest")
        if verify_digest and digest and digest != _payload_digest(html):
            raise ValueError(f"payload digest mismatch for {url}")
        yield url, ts, html, headers.get("warc-record-id", "")


def _open_warc(path: str):
    if path.endswith(".gz"):
        return gzip.open(path, "rb")
    return open(path, "rb")


def _list_warc_files(path: str) -> list[str]:
    if os.path.isfile(path):
        return [path]
    return sorted(
        os.path.join(path, f)
        for f in os.listdir(path)
        if f.endswith((".warc", ".warc.gz")) and not f.startswith((".", "_"))
    )


# --------------------------------------------------------------------------
# Spark DataSource
# --------------------------------------------------------------------------

class _WarcPartition(InputPartition):
    def __init__(self, file: str):
        self.file = file


class _WarcReader(DataSourceReader):
    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("warc source requires a path: .load('/dir/of/warcs')")
        self.verify = options.get("verify_digest", "true").lower() != "false"

    def partitions(self):
        # one partition per segment file: a CC snapshot's ~80k files give a
        # 1000-executor cluster even, coordination-free parallelism
        return [_WarcPartition(f) for f in _list_warc_files(self.path)]

    def read(self, partition: _WarcPartition):
        with _open_warc(partition.file) as stream:
            for url, ts, html, rid in parse_warc_stream(stream, self.verify):
                yield url, ts, html, rid


class _WarcStreamReader(DataSourceStreamReader):
    """Tail a directory of WARC segment files as a stream — the crawl-ingest
    front end (`spark.readStream.format("warc").load(dir)` feeds
    streaming/ingest.py unchanged).

    Offsets: segment files are immutable and append-only (a crawler finishes
    a segment, then drops it in), so an offset is simply the sorted list of
    file names seen by that point; a micro-batch's partitions are the
    files in `end` minus `start` — one InputPartition per new segment, same
    parallel shape as the batch reader.  The offset payload grows with the
    file count (fine for ~1e5 names); a production long-runner would compact
    it to a high-water log index, which Spark's own file source also does.
    """

    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("warc stream requires a path: .load('/dir/of/warcs')")
        self.verify = options.get("verify_digest", "true").lower() != "false"

    def initialOffset(self) -> dict:
        return {"files": []}

    def latestOffset(self) -> dict:
        return {"files": [os.path.basename(f) for f in _list_warc_files(self.path)]}

    def partitions(self, start: dict, end: dict):
        new = sorted(set(end["files"]) - set(start["files"]))
        return [_WarcPartition(os.path.join(self.path, f)) for f in new]

    def read(self, partition: _WarcPartition):
        with _open_warc(partition.file) as stream:
            for url, ts, html, rid in parse_warc_stream(stream, self.verify):
                yield url, ts, html, rid

    def commit(self, end: dict) -> None:
        return None


@dataclass
class _WarcCommit(WriterCommitMessage):
    file: str
    records: int


class _WarcWriter(DataSourceWriter):
    def __init__(self, options: dict, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("warc sink requires a path: .save('/out/dir')")
        # driver-side (constructed before any task runs): stage the overwrite
        if overwrite and os.path.isdir(self.path):
            for f in _list_warc_files(self.path):
                os.remove(f)
        os.makedirs(self.path, exist_ok=True)
        # append mode must not collide with segments from earlier jobs, so
        # physical names carry a per-job nonce; the in-file warcinfo record
        # uses the job-independent LOGICAL name, keeping segment bytes
        # deterministic for identical input partitions.
        self.job_id = uuid.uuid4().hex[:8]

    def write(self, rows) -> _WarcCommit:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        logical = f"part-{pid:05d}.warc.gz"
        name = f"part-{pid:05d}-{self.job_id}.warc.gz"
        # unique temp name per attempt; committed by atomic rename below, so
        # a retried/speculative task never interleaves bytes with the winner
        tmp = os.path.join(self.path, f".{name}.{uuid.uuid4().hex}.tmp")
        n = 0
        with open(tmp, "wb") as out:
            out.write(_gzip_member(build_warcinfo_record(logical)))
            for row in rows:
                html = row["html"]
                html = bytes(html) if html is not None else b""
                out.write(
                    _gzip_member(
                        build_response_record(row["url"], row["warc_ts"], html)
                    )
                )
                n += 1
        os.replace(tmp, os.path.join(self.path, name))
        return _WarcCommit(file=name, records=n)

    def commit(self, messages):
        return None

    def abort(self, messages):
        return None


class WarcDataSource(DataSource):
    """`spark.read.format("warc")` / `df.write.format("warc")` after
    `register_warc(spark)`.  Read schema is fixed (WARC_SCHEMA); the writer
    needs url/warc_ts/html columns and ignores the rest."""

    @classmethod
    def name(cls) -> str:
        return "warc"

    def schema(self):
        return WARC_SCHEMA

    def reader(self, schema):
        return _WarcReader(self.options)

    def streamReader(self, schema):
        return _WarcStreamReader(self.options)

    def writer(self, schema, overwrite: bool):
        names = set(schema.fieldNames())
        missing = {"url", "warc_ts", "html"} - names
        if missing:
            raise ValueError(f"warc sink needs columns {sorted(missing)}")
        return _WarcWriter(self.options, overwrite)


def register_warc(spark) -> None:
    spark.dataSource.register(WarcDataSource)
