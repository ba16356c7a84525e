"""Quickstart: the reference user's workflow on the Spark engine.

Mirrors the reference's `doc2vec run config.yaml` + MCP query loop
(doc2vec.ts:2044-2069, mcp/src/server.ts:117-195) end-to-end on a local
directory source: ingest -> incremental re-run (nothing re-embedded when
nothing changed) -> edit one file -> re-run (only the changed document
re-syncs) -> vector query -> page reconstruction.

Run:  python examples/quickstart.py
Everything is hermetic (deterministic hash embeddings, temp directories);
tests/test_examples.py executes this script as part of the suite.
"""

from __future__ import annotations

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    from doc2vec_spark.engine import Doc2VecSparkEngine
    from doc2vec_spark.session import get_spark

    spark = get_spark("doc2vec-spark-quickstart")
    spark.sparkContext.setLogLevel("ERROR")

    workdir = Path(tempfile.mkdtemp(prefix="d2v_quickstart_"))
    docs_dir = workdir / "docs"
    docs_dir.mkdir()
    (docs_dir / "install.md").write_text(
        "# Install\n\nRun the installer, then verify the service starts.\n"
    )
    (docs_dir / "query.md").write_text(
        "# Querying\n\nUse the search endpoint to find relevant chunks by "
        "cosine similarity over embeddings.\n"
    )

    # the reference's YAML config shape (doc2vec.ts:121-162), as a dict
    config = {
        "sources": [
            {
                "type": "local_directory",
                "path": str(docs_dir),
                "product_name": "quickstart",
                "version": "latest",
                "include_extensions": [".md"],
            }
        ]
    }

    engine = Doc2VecSparkEngine(spark, str(workdir / "store"))

    stats = engine.run(config)[0]
    print(
        f"run 1: ok={stats.ok} added={stats.counters.chunks_added} "
        f"(fresh ingest embeds everything)"
    )

    stats = engine.run(config)[0]
    print(
        f"run 2: ok={stats.ok} added={stats.counters.chunks_added} "
        f"(nothing changed -> nothing re-embedded, W3)"
    )

    (docs_dir / "query.md").write_text(
        "# Querying\n\nUse the search endpoint; results are ranked by "
        "ascending cosine distance.\n"
    )
    stats = engine.run(config)[0]
    print(
        f"run 3: ok={stats.ok} added={stats.counters.chunks_added} "
        f"(one edited doc -> only its chunks re-sync)"
    )

    hits = engine.query_documentation(
        "how do I search for chunks", product_name="quickstart", k=2
    ).collect()
    print("query_documentation top hit:", hits[0]["url"], round(hits[0]["distance"], 4))

    page = engine.reconstruct_page(hits[0]["url"])
    print("reconstructed page starts:", page.splitlines()[0])

    print("store stats:", engine.stats())


if __name__ == "__main__":
    main()
