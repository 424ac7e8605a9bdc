"""Real `spark-submit --py-files` smoke test (north rule: the job ships as a
zip to a cluster; sandbox proxy = local master, package imported ONLY from
the built zip, not the repo working dir)."""

import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.skipif(shutil.which("spark-submit") is None, reason="no spark-submit")
def test_spark_submit_pyfiles_end_to_end(spark, tmp_path):
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    from make_pyfiles import build

    zip_path = build(str(tmp_path / "gds_spark.zip"))

    edges = spark.createDataFrame(
        [(i, (i + 1) % 40) for i in range(40)] + [(0, 20), (20, 0)],
        "src long, dst long",
    )
    edges_path = str(tmp_path / "edges")
    edges.write.parquet(edges_path)
    out_path = str(tmp_path / "scores")

    env = dict(os.environ)
    # the submitted job must resolve the package from the zip alone
    env["PYTHONPATH"] = ""
    env.pop("SPARK_HOME", None)
    proc = subprocess.run(
        [
            "spark-submit",
            "--master", "local[4]",
            "--conf", "spark.sql.shuffle.partitions=4",
            "--py-files", zip_path,
            os.path.join(REPO, "scripts", "submit_pagerank.py"),
            "--edges", edges_path,
            "--output", out_path,
            "--max-iterations", "30",
            "--tolerance", "1e-6",
            # exercises the accelerator flag through a real submit; on this
            # pulse-train ring graph the valid-gate keeps corrections ~0, so
            # the convergence/sum assertions below are unchanged
            "--extrapolate-every", "12",
        ],
        capture_output=True,
        text=True,
        timeout=420,
        cwd=str(tmp_path),  # NOT the repo: imports must come from the zip
        env=env,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    line = [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
    meta = json.loads(line)
    assert meta["nodes"] == 40
    assert meta["did_converge"] or meta["ran_iterations"] == 30

    got = spark.read.parquet(out_path)
    assert got.count() == 40
    total = got.agg({"score": "sum"}).collect()[0][0]
    # ring + chord graph, no dangling mass: sum(score) ~= n
    assert abs(total - 40.0) < 1.0


@pytest.mark.skipif(shutil.which("spark-submit") is None, reason="no spark-submit")
def test_spark_submit_warc_pages_input(spark, tmp_path):
    """The full Common-Crawl path under a real submit: WARC segments in,
    link extraction + graph build + PageRank in-job, with BOTH the package
    AND the Python datasource class resolved from the --py-files zip."""
    from datetime import datetime

    sys.path.insert(0, os.path.join(REPO, "scripts"))
    from make_pyfiles import build

    from graph_data_science_spark.sources.warc import register_warc

    zip_path = build(str(tmp_path / "gds_spark.zip"))

    ts = datetime(2022, 3, 1, 8, 0, 0)
    url = lambda k: f"https://h.example/{k}"
    link = lambda t: f'<html><body><a href="{url(t)}">x</a></body></html>'.encode()
    rows = [  # 4-page cycle + one chord
        (url("a"), ts, link("b")),
        (url("b"), ts, link("c")),
        (url("c"), ts, link("d")),
        (
            url("d"),
            ts,
            (
                f'<html><body><a href="{url("a")}">x</a>'
                f'<a href="{url("b")}">y</a></body></html>'
            ).encode(),
        ),
    ]
    pages = spark.createDataFrame(rows, "url string, warc_ts timestamp, html binary")
    register_warc(spark)
    segments = str(tmp_path / "segments")
    pages.repartition(2).write.format("warc").mode("overwrite").save(segments)
    out_path = str(tmp_path / "warc_scores")

    env = dict(os.environ)
    env["PYTHONPATH"] = ""
    env.pop("SPARK_HOME", None)
    proc = subprocess.run(
        [
            "spark-submit",
            "--master", "local[4]",
            "--conf", "spark.sql.shuffle.partitions=4",
            "--py-files", zip_path,
            os.path.join(REPO, "scripts", "submit_pagerank.py"),
            "--edges", segments,
            "--input-format", "warc-pages",
            "--output", out_path,
            "--max-iterations", "50",
            "--tolerance", "1e-6",
        ],
        capture_output=True,
        text=True,
        timeout=420,
        cwd=str(tmp_path),  # imports must come from the zip
        env=env,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    line = [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
    meta = json.loads(line)
    assert meta["nodes"] == 4
    got = spark.read.parquet(out_path)
    assert got.count() == 4
    total = got.agg({"score": "sum"}).collect()[0][0]
    assert abs(total - 4.0) < 0.5  # cycle graph: no dangling mass
