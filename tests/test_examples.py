"""The examples must keep running — they are the migration story for a
reference user (`examples/quickstart.py` mirrors `doc2vec run` + the MCP
query loop)."""

from __future__ import annotations

import runpy
from pathlib import Path


def test_quickstart_example_runs_end_to_end(spark, capsys):
    path = Path(__file__).resolve().parent.parent / "examples" / "quickstart.py"
    runpy.run_path(str(path), run_name="__main__")
    out = capsys.readouterr().out
    assert "run 1: ok=True added=2" in out
    assert "run 2: ok=True added=0" in out  # W3: unchanged -> no re-embed
    assert "run 3: ok=True added=1" in out  # only the edited doc re-syncs
    assert "reconstructed page starts: [Topic: Install]" in out


def test_curation_pipeline_example_runs(spark, capsys, monkeypatch):
    path = (
        Path(__file__).resolve().parent.parent / "examples" / "curation_pipeline.py"
    )
    monkeypatch.setattr("sys.argv", [str(path)])  # argv[1:] is the sf_dir
    runpy.run_path(str(path), run_name="__main__")
    out = capsys.readouterr().out
    assert "corpus report" in out
    assert "line-level dedup:" in out
    assert "split assignment:" in out and "'train'" in out
    assert "windowed distinct-user HLL" in out


def test_serving_ann_example_runs(spark, capsys):
    path = Path(__file__).resolve().parent.parent / "examples" / "serving_ann.py"
    runpy.run_path(str(path), run_name="__main__")
    out = capsys.readouterr().out
    assert "index built:" in out
    assert "probe answer: https://docs.example.com/planted.md" in out
    assert "small-corpus fallthrough == exact scan: True" in out
    assert "persisted index reload identical: True" in out
    assert "stale after rewrite: True" in out
