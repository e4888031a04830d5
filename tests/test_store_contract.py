"""StageStore contract coverage the sandbox can't get from a real Iceberg
runtime (VERDICT r1 #6 / ADVICE r1): drive IcebergStore.write/read/
_write_metrics against a stubbed writeTo/read.table, and pin the
ParquetStore metrics fallback for non-local roots."""

from __future__ import annotations

from dedup_spark.sources.store import IcebergStore, ParquetStore


def test_iceberg_store_write_read_metrics(spark, tmp_path, monkeypatch):
    root = str(tmp_path)
    store = IcebergStore("dedup", root, "r1", "fp1")
    written: dict[str, str] = {}

    class FakeWriter:
        def __init__(self, df, tbl):
            self.df, self.tbl = df, tbl

        def createOrReplace(self):
            path = f"{root}/iceberg_{self.tbl.replace('.', '_')}"
            self.df.write.mode("overwrite").parquet(path)
            written[self.tbl] = path

    df = spark.range(17).selectExpr("cast(id as string) AS image_id")
    # patch the CONCRETE classes (pyspark 4 classic subclasses the public
    # pyspark.sql.DataFrame base, which defines its own writeTo)
    monkeypatch.setattr(
        type(df), "writeTo", lambda df, tbl: FakeWriter(df, tbl)
    )
    monkeypatch.setattr(
        type(spark.read),
        "table",
        lambda rd, tbl: spark.read.parquet(written[tbl]),
    )
    res = store.write("t_x", df)
    assert res.rows == 17 and not res.skipped
    assert written == {"dedup.t_x": f"{root}/iceberg_dedup_t_x"}
    assert store.is_done("t_x")
    assert store.read(spark, "t_x").count() == 17
    m = store.metrics(spark).toPandas()
    assert m.rows_out.sum() == 17
    assert set(m.stage) == {"t_x"}
    lin = store.lineage()
    assert lin and lin[-1]["stage"] == "t_x" and lin[-1]["rows"] == 17


def test_parquet_metrics_fallback_for_nonlocal_root(spark, tmp_path):
    # a non-local table dir (s3://…) can't be globbed for parquet footers;
    # _write_metrics must fall back to the Spark aggregate, not record 0
    store = ParquetStore(str(tmp_path), "r1", "fp1")
    df = spark.range(23).selectExpr("cast(id as string) AS image_id")
    orig = store._table_dir
    store._table_dir = lambda name: f"s3://bucket/{name}"  # unreachable dir
    rows = store._write_metrics("t_remote", df)
    store._table_dir = orig
    assert rows == 23
    m = store.metrics(spark).toPandas()
    assert m.loc[m.stage == "t_remote", "rows_out"].sum() == 23
