"""Degenerate-input robustness for the full pipeline: empty tables,
all-invalid rows, single rows, and cross-run determinism. A 10^12-row
deployment WILL hit empty partitions and empty stage outputs (e.g. an
incremental run over an unchanged snapshot); the orchestrator must come
out clean, not crash in a corner expression."""

from __future__ import annotations

import pytest

from dedup_spark.plans.pipeline import run_pipeline
from dedup_spark.sources.gen_images import gen_images


def _report(spark, root):
    return (
        spark.read.parquet(f"{root}/t_report")
        .toPandas()
        .sort_values("image_id")
        .reset_index(drop=True)
    )


def test_empty_input_completes_with_empty_outputs(spark, tmp_path):
    root = str(tmp_path / "empty_store")
    images = gen_images(spark, 50, 3).where("1 = 0")
    run = run_pipeline(spark, images, root, run_id="e0")
    assert not any(r.skipped for r in run.results)
    assert _report(spark, root).empty
    assert spark.read.parquet(f"{root}/t_clusters").count() == 0


def test_all_invalid_rows_filtered_not_fatal(spark, tmp_path):
    root = str(tmp_path / "invalid_store")
    # zero out dimensions: every row fails the validity predicates
    images = gen_images(spark, 40, 3).selectExpr(
        "image_id", "bytes", "0 as w", "0 as h", "fmt", "caption", "phash"
    )
    run_pipeline(spark, images, root, run_id="i0")
    assert spark.read.parquet(f"{root}/t_sigs").count() == 0
    assert spark.read.parquet(f"{root}/t_invalid").count() == 40
    assert _report(spark, root).empty


def test_single_image_is_its_own_cluster(spark, tmp_path):
    root = str(tmp_path / "single_store")
    images = gen_images(spark, 200, 3).limit(1).where("w > 0")
    n = images.count()
    if n == 0:  # pragma: no cover — seed-dependent invalid first row
        pytest.skip("first generated row was a planted-invalid row")
    run_pipeline(spark, images, root, run_id="s1")
    rep = _report(spark, root)
    assert len(rep) == 1
    assert rep.loc[0, "cluster_id"] == rep.loc[0, "image_id"]


def test_two_stores_identical_output(spark, tmp_path):
    """Same input, fresh stores → byte-identical cluster assignments and
    report (determinism is what makes the resume fingerprint sound)."""
    images = gen_images(spark, 250, 11)
    roots = [str(tmp_path / f"det_{i}") for i in (0, 1)]
    for root in roots:
        run_pipeline(spark, images, root, run_id="d")
    r0, r1 = (_report(spark, r) for r in roots)
    assert r0.equals(r1)


def test_udf_task_knob_overrides_core_rule(spark, monkeypatch):
    """SPARK_GRAFT_UDF_TASKS pins pandas-UDF task concurrency (small-host
    tune, BENCH/profile_sigs_n800k.jsonl); unset falls back to cores/2."""
    from dedup_spark.session import py_parallelism

    monkeypatch.delenv("SPARK_GRAFT_UDF_TASKS", raising=False)
    assert py_parallelism(spark) == max(
        spark.sparkContext.defaultParallelism // 2, 1
    )
    monkeypatch.setenv("SPARK_GRAFT_UDF_TASKS", "3")
    assert py_parallelism(spark) == 3
    monkeypatch.setenv("SPARK_GRAFT_UDF_TASKS", "0")
    assert py_parallelism(spark) == 1
