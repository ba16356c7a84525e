"""User-journey e2e: config-driven ingest of a local directory, incremental
re-sync, then the full query surface — the path a reference user takes."""

from __future__ import annotations

import os

import pytest


@pytest.fixture()
def docs_dir(tmp_path):
    d = tmp_path / "docs"
    d.mkdir()
    (d / "intro.md").write_text("# Intro\n" + "welcome to the project. " * 40)
    (d / "api.md").write_text(
        "# API\n## Auth\n" + "the zanzibar token endpoint issues credentials. " * 20
    )
    (d / "huge.md").write_text("x" * 100_000)
    return d


def test_env_substitution(monkeypatch):
    from doc2vec_spark.engine import substitute_env

    monkeypatch.setenv("MY_TOKEN", "sekret")
    cfg = {"a": "${MY_TOKEN}", "b": ["${MY_TOKEN}", "plain"], "c": {"d": "${UNSET_VAR}"}}
    out = substitute_env(cfg)
    assert out["a"] == "sekret"
    assert out["b"] == ["sekret", "plain"]
    assert out["c"]["d"] == "${UNSET_VAR}"  # unset stays verbatim


def test_yaml_config_roundtrip(tmp_path, monkeypatch):
    from doc2vec_spark.engine import load_config

    monkeypatch.setenv("DOCS_PATH", "/data/docs")
    (tmp_path / "c.yaml").write_text(
        "sources:\n  - type: local_directory\n    path: ${DOCS_PATH}\n    product_name: p\n"
    )
    cfg = load_config(str(tmp_path / "c.yaml"))
    assert cfg["sources"][0]["path"] == "/data/docs"


def test_full_user_journey(spark, tmp_path, docs_dir):
    from doc2vec_spark.engine import Doc2VecSparkEngine

    engine = Doc2VecSparkEngine(spark, str(tmp_path / "engine"))
    config = {
        "sources": [
            {
                "type": "local_directory",
                "path": str(docs_dir),
                "product_name": "myproj",
                "include_extensions": [".md"],
                "max_size": 50_000,  # P6: huge.md excluded
            }
        ]
    }

    results = engine.run(config)
    assert len(results) == 1 and results[0].ok
    assert results[0].counters.items_new == 2  # huge.md guarded out

    s = engine.stats()
    assert s["documents"] == 2 and s["products"] == 1 and s["chunks"] >= 2

    # KNN query: self-query with a stored chunk's exact content must return
    # that chunk as top-1 at distance ~0 (the retrieval-plumbing property the
    # deterministic stand-in embedding guarantees; semantic recall on
    # paraphrases is a property of a real provider, not of the engine)
    api_url = next(
        r["url"] for r in engine.store.read().select("url").distinct().collect()
        if "api.md" in r["url"]
    )
    api_content = engine.get_chunks(api_url).collect()[0]["content"]
    hits = engine.query_documentation(
        api_content, product_name="myproj", k=2
    ).collect()
    assert hits and hits[0]["url"] == api_url
    assert hits[0]["distance"] < 1e-6

    # page reconstruction round-trips
    url = hits[0]["url"]
    page = engine.reconstruct_page(url)
    assert "zanzibar token endpoint" in page

    # incremental: unchanged re-run writes nothing
    again = engine.run(config)
    assert again[0].counters.items_unchanged == 2
    assert again[0].counters.chunks_added == 0

    # mutate a doc -> exactly one update
    (docs_dir / "intro.md").write_text("# Intro\n" + "welcome to the NEW project. " * 40)
    third = engine.run(config)
    assert third[0].counters.items_updated == 1
    assert third[0].counters.items_unchanged == 1


def test_failing_source_is_contained(spark, tmp_path):
    from doc2vec_spark.engine import Doc2VecSparkEngine

    engine = Doc2VecSparkEngine(spark, str(tmp_path / "engine"))
    results = engine.run(
        {"sources": [{"type": "zendesk", "product_name": "x"}]}
    )
    assert len(results) == 1
    assert not results[0].ok and "unsupported" in results[0].error
    assert engine.store.count() == 0  # nothing advanced (W9)
