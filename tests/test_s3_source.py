"""S11: S3 object reader with per-object user-metadata resolution
(doc2vec.ts:1111-1118) — stubbed S3 client, real Spark plumbing."""

from __future__ import annotations


def _make_stub_factory(metadata: dict[str, dict[str, str]]):
    """Return a client factory picklable BY VALUE (defined as a closure, so
    executors don't need the tests package importable)."""

    def factory():
        class _StubClient:
            def head_object(self, Bucket: str, Key: str):
                for k, meta in metadata.items():
                    if Key.endswith(k):
                        return {"Metadata": meta}
                raise KeyError(Key)

        return _StubClient()

    return factory


_META = {
    "docs/a.md": {"product-name": "widget", "version": "2.0"},
    "docs/b.md": {"product-name": "gadget"},
}


def test_resolve_metadata_value_semantics():
    from doc2vec_spark.sources.s3 import resolve_metadata_value

    meta = {"product-name": "widget", "team": "docs"}
    # metadata(...) with the x-amz-meta- prefix stripped (AWS SDK behavior)
    assert resolve_metadata_value("metadata(x-amz-meta-product-name)", meta) == "widget"
    assert resolve_metadata_value("metadata(product-name)", meta) == "widget"
    assert resolve_metadata_value("metadata(missing-key)", meta) == ""  # absent -> ''
    assert resolve_metadata_value("literal-value", meta) == "literal-value"
    assert resolve_metadata_value("", meta) == ""


def test_parse_s3_path():
    from doc2vec_spark.sources.s3 import parse_s3_path

    assert parse_s3_path("s3://bkt/docs/a.md") == ("bkt", "docs/a.md")
    assert parse_s3_path("s3a://bkt/x/y.txt") == ("bkt", "x/y.txt")
    assert parse_s3_path("file:///tmp/docs/a.md")[1].endswith("tmp/docs/a.md")


def test_read_s3_objects_resolves_config_fields(spark, tmp_path):
    from doc2vec_spark.sources.s3 import read_s3_objects

    d = tmp_path / "docs"
    d.mkdir()
    (d / "a.md").write_text("# A\nbody a")
    (d / "b.md").write_text("# B\nbody b")

    df = read_s3_objects(
        spark,
        str(tmp_path),
        config_fields={
            "product_name": "metadata(x-amz-meta-product-name)",
            "version": "metadata(version)",
            "source": "s3-docs",  # static config value passes through
        },
        client_factory=_make_stub_factory(_META),
    )
    rows = {r["url"].rsplit("/", 1)[-1]: r for r in df.collect()}
    assert rows["a.md"]["product_name"] == "widget"
    assert rows["a.md"]["version"] == "2.0"
    assert rows["b.md"]["product_name"] == "gadget"
    assert rows["b.md"]["version"] == ""  # missing metadata key -> ''
    assert all(r["source"] == "s3-docs" for r in rows.values())
    assert rows["a.md"]["markdown"].startswith("# A")


def test_head_failure_yields_empty_metadata(spark, tmp_path):
    from doc2vec_spark.sources.s3 import read_s3_objects

    d = tmp_path / "docs"
    d.mkdir()
    (d / "unknown.md").write_text("# U\nbody")

    df = read_s3_objects(
        spark,
        str(tmp_path),
        config_fields={"product_name": "metadata(product-name)"},
        client_factory=_make_stub_factory(_META),
    )
    (row,) = df.collect()
    assert row["product_name"] == ""  # HEAD raised -> empty map -> ''
