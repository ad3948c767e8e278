"""Iceberg-gated code paths, exercised without the runtime jar.

The sandbox has no network and no Iceberg jars (documented in
plans/catalog.py), so the real table format can't load; these tests stub
the DataFrameWriterV2/reader surface to prove the ``fmt='iceberg'``
branches issue the right calls — the gated code is wired, not dead. The
session wiring itself (``session.iceberg_conf`` + ``iceberg_jars``) is
asserted as pure config.
"""

import pytest


def test_iceberg_conf_shape(tmp_path):
    from deepex_spark.session import ICEBERG_PACKAGE, iceberg_conf

    conf = iceberg_conf(str(tmp_path / "wh"), catalog_name="lake")
    assert conf["spark.sql.catalog.lake"] == "org.apache.iceberg.spark.SparkCatalog"
    assert conf["spark.sql.catalog.lake.type"] == "hadoop"
    assert conf["spark.sql.catalog.lake.warehouse"].endswith("wh")
    assert "IcebergSparkSessionExtensions" in conf["spark.sql.extensions"]
    assert ICEBERG_PACKAGE.startswith("org.apache.iceberg:iceberg-spark-runtime")


def test_catalog_iceberg_write_read_branches(spark, tmp_path, monkeypatch):
    """Catalog(fmt='iceberg') must route writes through writeTo().append()/
    createOrReplace() and reads through spark.read.format('iceberg')."""
    from deepex_spark.plans.catalog import Catalog

    df = spark.createDataFrame([(1, "a")], "id long, s string")
    calls = []

    class FakeWriterV2:
        def __init__(self, table):
            self.table = table

        def createOrReplace(self):
            calls.append(("createOrReplace", self.table))

        def append(self):
            calls.append(("append", self.table))

    monkeypatch.setattr(type(df), "writeTo", lambda self, t: FakeWriterV2(t), raising=True)

    cat = Catalog(str(tmp_path), fmt="iceberg")
    cat.write(df, "lake.db.triples", mode="overwrite")
    cat.write(df, "lake.db.triples", mode="append")
    assert calls == [
        ("createOrReplace", "lake.db.triples"),
        ("append", "lake.db.triples"),
    ]

    reads = []
    real_format = type(spark.read).format

    class FakeLoader:
        def load(self, path):
            reads.append(path)
            return df

    def fake_format(self, fmt):
        if fmt == "iceberg":
            return FakeLoader()
        return real_format(self, fmt)

    monkeypatch.setattr(type(spark.read), "format", fake_format, raising=True)
    out = cat.read(spark, "lake.db.triples")
    assert reads == ["lake.db.triples"]
    assert out is df


def test_read_pages_iceberg_branch(spark, monkeypatch):
    from deepex_spark.sources import pages as pages_mod

    reads = []
    df_sentinel = spark.createDataFrame([("u",)], "url string")
    real_format = type(spark.read).format

    class FakeLoader:
        def load(self, path):
            reads.append(path)
            return df_sentinel

    def fake_format(self, fmt):
        if fmt == "iceberg":
            return FakeLoader()
        return real_format(self, fmt)

    monkeypatch.setattr(type(spark.read), "format", fake_format, raising=True)
    out = pages_mod.read_pages(spark, "lake.db.pages", fmt="iceberg")
    assert reads == ["lake.db.pages"] and out is df_sentinel


def test_iceberg_jar_resolution_unavailable_offline():
    """Honest negative: resolving the runtime jar needs the network the
    sandbox doesn't have. If this ever starts passing, promote the stubbed
    tests above to a real hadoop-catalog round trip."""
    import socket

    try:
        socket.getaddrinfo("repo1.maven.org", 443)
    except OSError:
        pytest.skip("offline as expected — real Iceberg round trip impossible")
    pytest.fail("network available: wire a real Iceberg round-trip test")
