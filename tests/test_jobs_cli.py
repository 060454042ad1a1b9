"""End-to-end CLI job integration: ingest -> delete -> query, each in
its own subprocess (the spark-submit shape, plain python driver)."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(script, *args):
    env = dict(os.environ, PYTHONPATH=REPO)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "jobs", script), *args],
        capture_output=True, text=True, env=env, cwd="/tmp", timeout=300,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    return [json.loads(l) for l in lines]


@pytest.mark.slow
def test_ingest_delete_query_roundtrip(tmp_path):
    wd = str(tmp_path / "kgwork")

    ingest = _run(
        "ingest_kg.py", "--synthesize-convs", "8", "--workdir", wd,
        "--run-id", "r1",
    )[-1]
    assert ingest["n_triples"] > 0

    deleted = _run(
        "delete_conversation.py", "--workdir", wd,
        "--conv-ids", "conv00002", "--run-id", "d1",
    )[-1]
    assert deleted["nodes_after"] <= deleted["nodes_before"]
    assert deleted["edges_after"] < deleted["edges_before"]
    assert deleted["deleted_ids"] >= 1
    assert os.path.exists(os.path.join(wd, "nodes_d1", "_SUCCESS"))

    rows = _run(
        "query_kg.py", "--workdir", wd, "--query", "alpha beta gamma",
        "--k", "3", "--hops", "1",
    )
    assert rows, "query returned no documents"
    for r in rows:
        assert r["text"].startswith("Text Content:")
        assert r["n_chunks"] >= 1

    comp = _run(
        "query_kg.py", "--workdir", wd, "--query", rows[0]["text"][:200],
        "--k", "3", "--hops", "1", "--compress",
    )
    # compression may filter everything for a decorrelated query; for a
    # query that IS a prefix of the context, at least one piece survives
    assert isinstance(comp, list)


@pytest.mark.slow
def test_spark_submit_py_files_roundtrip(tmp_path):
    """The north-rule deployment shape verbatim: `spark-submit
    --py-files context_aware_rag_spark.zip jobs/ingest_kg.py` in a real
    spark-submit process (not a python driver), then EP3 retrieval over
    the produced workdir the same way. Skips when spark-submit is not
    on this box."""
    import shutil
    import zipfile

    submit = shutil.which("spark-submit") or (
        "/opt/spark/bin/spark-submit"
        if os.path.exists("/opt/spark/bin/spark-submit")
        else None
    )
    if submit is None:
        pytest.skip("no spark-submit binary available")

    pkg_zip = str(tmp_path / "context_aware_rag_spark.zip")
    pkg_dir = os.path.join(REPO, "context_aware_rag_spark")
    with zipfile.ZipFile(pkg_zip, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(pkg_dir):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    zf.write(full, os.path.relpath(full, REPO))

    wd = str(tmp_path / "kgwork")

    def run_submit(script, *args):
        out = subprocess.run(
            [submit, "--master", "local[8]", "--py-files", pkg_zip,
             os.path.join(REPO, "jobs", script), *args],
            capture_output=True, text=True, cwd="/tmp", timeout=480,
        )
        assert out.returncode == 0, out.stderr[-3000:]
        return [json.loads(l) for l in out.stdout.splitlines()
                if l.startswith("{")]

    ingest = run_submit(
        "ingest_kg.py", "--synthesize-convs", "20", "--workdir", wd,
        "--run-id", "s1",
    )[-1]
    assert ingest["n_triples"] > 0
    assert ingest["stages"]["chunks"]["rows"] > 0

    hits = run_submit(
        "query_kg.py", "--workdir", wd, "--query",
        "ada lovelace charles babbage collaborated", "--k", "3",
    )
    assert 1 <= len(hits) <= 3
    assert all("score" in h and "text" in h for h in hits)


@pytest.mark.slow
def test_community_reports_job(tmp_path):
    wd = str(tmp_path / "kgwork")
    ingest = _run(
        "ingest_kg.py", "--synthesize-convs", "12", "--workdir", wd,
        "--run-id", "r1",
    )[-1]
    assert ingest["n_triples"] > 0

    rows = _run(
        "community_reports.py", "--workdir", wd, "--run-id", "c1",
        "--query", "alice berlin", "--entity", "Alice Johnson::Person",
        "--k", "3",
    )
    summary = rows[-1]
    assert summary["n_communities"] == 2  # the sf0.01-corpus structure
    assert summary["n_parents"] >= 1
    assert summary["largest_community"] == 22
    assert os.path.exists(
        os.path.join(wd, "communities_c1", "reports", "_SUCCESS")
    )
    assert os.path.exists(
        os.path.join(wd, "communities_c1", "hierarchy", "_SUCCESS")
    )
    search = [r["search"] for r in rows if "search" in r]
    assert search and search[0]["rank"] == 1 and search[0]["score"] >= 1
    local = [r["local"] for r in rows if "local" in r]
    sections = {r["section"] for r in local}
    assert sections == {"report", "neighbor"}
