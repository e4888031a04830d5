"""Checkpoint/resume semantics (SURVEY.md §2 B38; BASELINE.json:14
"resumable from checkpoint with per-partition lineage + metrics")."""

import json
import os

import pytest

from dedup_spark.config import PipelineConfig
from dedup_spark.plans.pipeline import run_pipeline
from dedup_spark.sources.gen_images import gen_images

N = 300


@pytest.fixture(scope="module")
def first_run(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("resume_store"))
    images = gen_images(spark, N, 7)
    run = run_pipeline(spark, images, root, run_id="rr")
    report = spark.read.parquet(f"{root}/t_report").toPandas()
    return root, run, report.sort_values("image_id").reset_index(drop=True)


def test_rerun_skips_all_stages(spark, first_run):
    root, run1, report1 = first_run
    images = gen_images(spark, N, 7)
    run2 = run_pipeline(spark, images, root, run_id="rr")
    assert all(r.skipped for r in run2.results), [
        r.name for r in run2.results if not r.skipped
    ]
    report2 = (
        spark.read.parquet(f"{root}/t_report")
        .toPandas()
        .sort_values("image_id")
        .reset_index(drop=True)
    )
    assert report1.equals(report2)


def test_mid_pipeline_resume_recomputes_only_downstream(spark, first_run):
    root, _, report1 = first_run
    # simulate a crash after t_verified: nuke manifests of later stages
    downstream = ["t_clusters", "t_winners", "t_report", "t_dir_report"]
    for name in downstream:
        os.remove(os.path.join(root, f"{name}.manifest.json"))
    images = gen_images(spark, N, 7)
    run = run_pipeline(spark, images, root, run_id="rr")
    recomputed = {r.name for r in run.results if not r.skipped}
    assert recomputed == set(downstream)
    report2 = (
        spark.read.parquet(f"{root}/t_report")
        .toPandas()
        .sort_values("image_id")
        .reset_index(drop=True)
    )
    assert report1.equals(report2)


def test_config_change_invalidates_checkpoints(spark, first_run):
    root, _, _ = first_run
    images = gen_images(spark, N, 7)
    cfg2 = PipelineConfig(jaccard_threshold=0.9)
    run = run_pipeline(spark, images, root, run_id="rr2", cfg=cfg2)
    assert all(not r.skipped for r in run.results), (
        "different config fingerprint must recompute everything"
    )


def test_plan_only_knobs_keep_fingerprint_stable():
    """containment_broadcast_max only changes the physical join plan (both
    shapes output-identical, tests/test_suffix.py) — toggling the huge-corpus
    escape hatch must not invalidate checkpoints (ADVICE r3)."""
    base = PipelineConfig().fingerprint()
    assert PipelineConfig(containment_broadcast_max=0).fingerprint() == base
    assert PipelineConfig(jaccard_threshold=0.9).fingerprint() != base


def test_lineage_and_metrics_written(spark, first_run):
    root, _, _ = first_run
    with open(os.path.join(root, "t_lineage.jsonl")) as f:
        lineage = [json.loads(l) for l in f if l.strip()]
    stages = {l["stage"] for l in lineage}
    assert {"t_sigs", "t_verified", "t_clusters", "t_report"} <= stages
    assert all(l["status"] == "done" and "fingerprint" in l for l in lineage)

    metrics = spark.read.parquet(f"{root}/t_metrics").toPandas()
    assert {"stage", "partition_id", "rows_out", "run_id"} <= set(metrics.columns)
    m_rr = metrics[metrics.run_id == "rr"]
    # t_sigs was computed exactly once under run "rr": per-partition rows sum
    # to the materialized row count (per-partition lineage mandate)
    assert m_rr.groupby("stage").rows_out.sum()["t_sigs"] == N - 3  # 3 invalid
    # approximation censuses are durable metrics rows, not just logs
    # (VERDICT r3 #5): one row per census per computing run
    census = m_rr[m_rr.stage.str.startswith("census_")]
    assert set(census.stage) == {
        "census_salting_lost_pairs",
        "census_verify_slack_skips",
        "census_containment_skipped_groups",
    }
    assert (census.rows_out >= 0).all()


def test_census_backfill_on_skip(spark, tmp_path):
    """ADVICE r4: censuses are now written BEFORE the stage manifest, so
    'done' implies census-present for new stores. For stores committed by
    older code (census after manifest — a crash window), the skip path
    backfills a missing census from the committed table. Simulate the
    legacy hole by deleting the census rows of a done store and resuming.
    (Own store: the module fixture's store is rewritten under another
    run_id by the config-change test, so skips there are order-dependent.)"""
    root = str(tmp_path / "census_store")
    images = gen_images(spark, 120, 7)
    run_pipeline(spark, images, root, run_id="cb")
    mdir = os.path.join(root, "t_metrics")
    restorable = [
        "census_salting_lost_pairs-cb.parquet",
        "census_containment_skipped_groups-cb.parquet",
    ]
    before = spark.read.parquet(mdir).toPandas()
    before = dict(
        zip(before[before.partition_id == -1].stage,
            before[before.partition_id == -1].rows_out)
    )
    for fname in restorable:
        os.remove(os.path.join(mdir, fname))

    run = run_pipeline(spark, images, root, run_id="cb")
    assert all(r.skipped for r in run.results)

    after = spark.read.parquet(mdir).toPandas()
    after = dict(
        zip(after[after.partition_id == -1].stage,
            after[after.partition_id == -1].rows_out)
    )
    for fname in restorable:
        stage = fname.rsplit("-", 1)[0]
        assert after[stage] == before[stage], stage
    # the verify slack census is only observable while the stage computes
    # (census_on_skip=False) — still present because we did not delete it
    assert "census_verify_slack_skips" in after


def test_sync_stage_failure_reaps_async_pool(spark, tmp_path, monkeypatch):
    """ADVICE r4: when a SYNCHRONOUS stage raises, the async diagnostic
    pool must be reaped before the exception propagates — its non-daemon
    workers must not keep running Spark jobs past the pipeline's death (the
    old code never reached join_async() on this path). The already-submitted
    async stages finish their commits (Spark jobs cannot be interrupted
    mid-flight; waiting is the reap), then the primary error re-raises."""
    import dedup_spark.operators.winners as winners_mod

    root = str(tmp_path / "sync_fail_store")
    images = gen_images(spark, N, 7)

    def boom(df):
        raise RuntimeError("injected winner failure")

    monkeypatch.setattr(winners_mod, "select_winners", boom)
    with pytest.raises(RuntimeError, match="injected winner failure"):
        run_pipeline(spark, images, root, run_id="sf")
    # by t_winners the early async diagnostics were already running; the
    # failure path awaited them, so their commits are durable
    for name in ["t_invalid", "t_skew_report"]:
        assert os.path.exists(os.path.join(root, f"{name}.manifest.json")), name
    assert not os.path.exists(os.path.join(root, "t_winners.manifest.json"))

    monkeypatch.undo()
    run2 = run_pipeline(spark, images, root, run_id="sf")
    recomputed = {r.name for r in run2.results if not r.skipped}
    # everything downstream of (and including) the failed stage recomputes
    assert recomputed == {"t_winners", "t_dup_dirs", "t_report", "t_dir_report"}


def test_async_stage_failure_surfaces_and_resumes(spark, tmp_path, monkeypatch):
    """Leaf diagnostic stages run on a thread pool concurrent with the main
    chain (r4); a failure there must re-raise at the join point — never be
    swallowed — and a rerun must recompute ONLY the failed stage."""
    import dedup_spark.operators.report as report_mod

    root = str(tmp_path / "async_store")
    images = gen_images(spark, N, 7)

    real_dir_report = report_mod.dir_report

    def boom(df):
        raise RuntimeError("injected dir_report failure")

    monkeypatch.setattr(report_mod, "dir_report", boom)
    with pytest.raises(RuntimeError, match="injected dir_report failure"):
        run_pipeline(spark, images, root, run_id="ar")
    assert not os.path.exists(os.path.join(root, "t_dir_report.manifest.json"))

    monkeypatch.setattr(report_mod, "dir_report", real_dir_report)
    run2 = run_pipeline(spark, images, root, run_id="ar")
    recomputed = {r.name for r in run2.results if not r.skipped}
    assert recomputed == {"t_dir_report"}
    assert spark.read.parquet(f"{root}/t_dir_report").count() >= 0
