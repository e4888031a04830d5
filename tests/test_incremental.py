"""Incremental signature reuse (plans.pipeline ``prior_sigs``): a nightly
append over a trillion-row corpus must not re-decode old payloads — the
signature stage is the only payload-touching stage and dominates the job.

Correctness contract: an incremental run (prior sigs + full current
snapshot) produces EXACTLY the outputs of a from-scratch run on the same
snapshot; deletes (ids missing from the snapshot) drop out of the reused
set; and prior rows are genuinely REUSED, not recomputed (proved by
poisoning one prior signature and watching the poison propagate)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dedup_spark.plans.pipeline import run_pipeline
from dedup_spark.sources.gen_images import gen_images

N_OLD, N_NEW = 250, 350  # gen rows are pure functions of (seed, id):
SEED = 7                 # gen(350) is gen(250) plus 100 appended rows


def _report(spark, root):
    return (
        spark.read.parquet(f"{root}/t_report")
        .toPandas()
        .sort_values("image_id")
        .reset_index(drop=True)
    )


def test_incremental_append_matches_full_run(spark, tmp_path):
    old = gen_images(spark, N_OLD, SEED)
    cur = gen_images(spark, N_NEW, SEED)

    base_root = str(tmp_path / "base")
    run_pipeline(spark, old, base_root, run_id="b", input_token="old")
    prior = spark.read.parquet(f"{base_root}/t_sigs")

    inc_root = str(tmp_path / "inc")
    run_pipeline(
        spark, cur, inc_root, run_id="i", input_token="cur|prior",
        prior_sigs=prior,
    )
    full_root = str(tmp_path / "full")
    run_pipeline(spark, cur, full_root, run_id="f", input_token="cur")

    assert _report(spark, inc_root).equals(_report(spark, full_root))


def test_incremental_reuses_prior_rows_and_drops_deletes(spark, tmp_path):
    old = gen_images(spark, N_OLD, SEED)
    base_root = str(tmp_path / "base")
    run_pipeline(spark, old, base_root, run_id="b", input_token="old")
    prior = spark.read.parquet(f"{base_root}/t_sigs")
    by_desc = [
        r.image_id
        for r in prior.select("image_id").orderBy(F.desc("image_id")).take(2)
    ]
    # poison an id OUTSIDE the k=64-ascending audit sample (the audit is
    # deliberately a sample, not a full recheck): if the incremental stage
    # recomputed payloads the poison would vanish; reuse means it must
    # propagate verbatim
    victim, some_id = by_desc  # delete the last id, poison the second-last
    poison = F.when(
        F.col("image_id") == some_id, F.lit("deadbeef")
    ).otherwise(F.col("sha256"))
    prior_poisoned = prior.withColumn("sha256", poison)

    # current snapshot: appends (250→350) AND a delete of one other old id
    cur = gen_images(spark, N_NEW, SEED).where(F.col("image_id") != victim)

    inc_root = str(tmp_path / "inc")
    run_pipeline(
        spark, cur, inc_root, run_id="i", input_token="cur|prior",
        prior_sigs=prior_poisoned,
    )
    sigs = spark.read.parquet(f"{inc_root}/t_sigs")
    assert (
        sigs.where(F.col("image_id") == some_id).first().sha256 == "deadbeef"
    )
    assert sigs.where(F.col("image_id") == victim).count() == 0
    # appended rows got real signatures
    assert sigs.count() > N_OLD


def test_incremental_audit_catches_drifted_prior(spark, tmp_path):
    """Prior sigs that disagree with recomputation under the current config
    (wrong shingle/hash knobs, corrupted table) must fail LOUDLY, not build
    a run on bad signatures: the stage re-decodes a deterministic sample of
    reused rows and compares."""
    import pytest

    old = gen_images(spark, N_OLD, SEED)
    base_root = str(tmp_path / "base")
    run_pipeline(spark, old, base_root, run_id="b", input_token="old")
    prior = spark.read.parquet(f"{base_root}/t_sigs")
    in_sample = prior.select("image_id").orderBy("image_id").first().image_id
    drifted = prior.withColumn(
        "sha256",
        F.when(F.col("image_id") == in_sample, F.lit("deadbeef")).otherwise(
            F.col("sha256")
        ),
    )
    cur = gen_images(spark, N_NEW, SEED)
    with pytest.raises(ValueError, match="incremental audit failed"):
        run_pipeline(
            spark, cur, str(tmp_path / "inc"), run_id="i",
            input_token="cur|prior", prior_sigs=drifted,
        )


def test_incremental_drops_metadata_invalidated_rows(spark, tmp_path):
    """A prior row whose CURRENT-snapshot metadata is invalid (w=0) must not
    be reused: incremental semi-joins reuse against the payload-free
    metadata validity predicates, so the run matches from-scratch, which
    routes the row to t_invalid (ADVICE r2 medium)."""
    old = gen_images(spark, N_OLD, SEED)
    base_root = str(tmp_path / "base")
    run_pipeline(spark, old, base_root, run_id="b", input_token="old")
    prior = spark.read.parquet(f"{base_root}/t_sigs")
    victim = prior.select("image_id").orderBy(F.desc("image_id")).first().image_id

    cur = gen_images(spark, N_NEW, SEED).withColumn(
        "w",
        F.when(F.col("image_id") == victim, F.lit(0)).otherwise(F.col("w")),
    )
    inc_root = str(tmp_path / "inc")
    run_pipeline(
        spark, cur, inc_root, run_id="i", input_token="curm|prior",
        prior_sigs=prior,
    )
    sigs = spark.read.parquet(f"{inc_root}/t_sigs")
    assert sigs.where(F.col("image_id") == victim).count() == 0
    invalid = spark.read.parquet(f"{inc_root}/t_invalid")
    assert invalid.where(F.col("image_id") == victim).count() == 1

    full_root = str(tmp_path / "full")
    run_pipeline(spark, cur, full_root, run_id="f", input_token="curm")
    assert _report(spark, inc_root).equals(_report(spark, full_root))
