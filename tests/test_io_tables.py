"""io_tables contracts: the Iceberg writeTo arm (S6's production claim —
no Iceberg runtime in this sandbox, so the call chain is contract-tested
via a recording stand-in) and the Hadoop-FS marker helpers the
commit/replay protocol rides (HDFS/S3-safe; local paths resolve to the
local filesystem, verified here)."""

import os

from named_entity_algorithm_project_spark.io_tables import (
    dir_has_parquet,
    ensure_dir,
    list_child_names,
    write_table,
)


class _RecordingWriter:
    def __init__(self, table, log):
        self.table = table
        self.log = log

    def partitionedBy(self, *cols):
        self.log.append(("partitionedBy", tuple(str(c) for c in cols)))
        return self

    def createOrReplace(self):
        self.log.append(("createOrReplace",))


def test_write_table_iceberg_call_chain(spark, monkeypatch):
    """With a catalog configured, write_table must route through
    DataFrame.writeTo(table).partitionedBy(...).createOrReplace() and not
    touch the parquet path."""
    df = spark.createDataFrame([("a", 1)], "k string, bucket int")
    log = []

    def fake_writeTo(self, table):
        log.append(("writeTo", table))
        return _RecordingWriter(table, log)

    # patch the session's concrete DataFrame class (pyspark 4 routes
    # pyspark.sql.DataFrame through a classic/connect dispatch base)
    monkeypatch.setattr(type(df), "writeTo", fake_writeTo, raising=True)
    spark.conf.set("spark.sql.catalog.kg", "fake.CatalogImpl")
    try:
        write_table(
            df, "/tmp/should-not-be-written", partition_by=["bucket"],
            iceberg_table="kg.db.triples",
        )
    finally:
        spark.conf.unset("spark.sql.catalog.kg")
    assert log[0] == ("writeTo", "kg.db.triples")
    assert log[1][0] == "partitionedBy" and "bucket" in log[1][1][0]
    assert log[2] == ("createOrReplace",)
    assert not os.path.exists("/tmp/should-not-be-written")


def test_write_table_falls_back_to_parquet_without_catalog(spark, tmp_path):
    """Naming an Iceberg table whose catalog is NOT configured must fall
    back to partitioned parquet at the path (the sandbox deployment)."""
    df = spark.createDataFrame([("a", 1), ("b", 2)], "k string, bucket int")
    out = str(tmp_path / "t")
    write_table(df, out, partition_by=["bucket"], iceberg_table="nope.db.t")
    assert sorted(
        n for n in os.listdir(out) if n.startswith("bucket=")
    ) == ["bucket=1", "bucket=2"]
    assert spark.read.parquet(out).count() == 2


def test_hadoop_fs_marker_helpers(spark, tmp_path):
    base = str(tmp_path / "markers")
    assert list_child_names(spark, base) == []
    assert not dir_has_parquet(spark, base)

    ensure_dir(spark, os.path.join(base, "bucket=3"))
    assert list_child_names(spark, base) == ["bucket=3"]
    assert not dir_has_parquet(spark, os.path.join(base, "bucket=3"))

    # a non-parquet file (e.g. _SUCCESS) does not count as a commit marker
    with open(os.path.join(base, "bucket=3", "_SUCCESS"), "w"):
        pass
    assert not dir_has_parquet(spark, os.path.join(base, "bucket=3"))

    with open(os.path.join(base, "bucket=3", "part-0.parquet"), "w") as f:
        f.write("x")
    assert dir_has_parquet(spark, os.path.join(base, "bucket=3"))

    # a FILE at the path is not a directory of markers
    file_path = str(tmp_path / "plainfile")
    with open(file_path, "w") as f:
        f.write("x")
    assert list_child_names(spark, file_path) == []
