"""Directory-digest rollup properties (SURVEY.md §2 B24/B25)."""

import pandas as pd
from pyspark.sql import functions as F

from dedup_spark.operators.rollup import dir_digests, dup_dirs


def _sigs(spark, rows):
    pdf = pd.DataFrame(rows, columns=["image_id", "sha256"])
    df = spark.createDataFrame(pdf)
    return df.withColumn("depth", F.size(F.split("image_id", "/")) - 1)


def test_rollup_order_invariant_and_name_agnostic(spark):
    rows = [
        ("r/a/x/f1", "h1"),
        ("r/a/x/f2", "h2"),
        ("r/a/y/f3", "h3"),
        # mirror with different leaf/sub names but identical content
        ("r/b/q/g9", "h3"),
        ("r/b/p/g7", "h2"),
        ("r/b/p/g8", "h1"),
    ]
    d1 = dir_digests(_sigs(spark, rows)).toPandas().set_index("dir")
    d2 = dir_digests(_sigs(spark, rows[::-1])).toPandas().set_index("dir")
    assert d1.sort_index().dir_digest.equals(d2.sort_index().dir_digest)
    # structure differs (x={f1,f2}, y={f3}) vs (p={g7,g8}, q={g9}) — the
    # subdir digests pair up and so do the parents
    assert d1.loc["r/a/x"].dir_digest == d1.loc["r/b/p"].dir_digest
    assert d1.loc["r/a/y"].dir_digest == d1.loc["r/b/q"].dir_digest
    assert d1.loc["r/a"].dir_digest == d1.loc["r/b"].dir_digest


def test_partial_overlap_is_not_dup_dir(spark):
    rows = [
        ("r/c/f1", "h1"),
        ("r/c/f2", "h2"),
        ("r/c/f3", "h3"),
        ("r/d/f1", "h1"),
        ("r/d/f2", "h2"),
        ("r/d/f3", "hX"),
    ]
    dirs = dir_digests(_sigs(spark, rows))
    dd = dup_dirs(dirs).toPandas()
    assert dd.empty


def test_nested_dup_reports_outermost_only(spark):
    rows = []
    for top in ("r/m1", "r/m2"):
        rows += [(f"{top}/s0/f1", "h1"), (f"{top}/s0/f2", "h2"), (f"{top}/s1/f3", "h3")]
    dirs = dir_digests(_sigs(spark, rows))
    dd = dup_dirs(dirs).toPandas()
    assert set(dd.dir) == {"r/m1", "r/m2"}  # s0/s1 pairs subsumed
