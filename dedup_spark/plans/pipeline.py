"""Stage orchestrator (SURVEY.md §2 B38, §3.3): the full dedup pipeline as a
DAG of checkpointed, resumable stages.

Each stage: if the store says (run_id, stage, config_fingerprint) is done,
SKIP and read its materialized output; else compute → write → mark done.
Killing the driver between any two stages and re-running with the same
run_id resumes mid-pipeline (BASELINE.json:14), verified by tests/test_resume.

Stage graph (each edge a materialization barrier):

  images ─ t_valid ─ t_sigs ─┬─ t_bands ─ t_salted ─ t_cand_pairs ─┐
                             ├─ t_exact_edges ──────────────────── ├─ t_verified
                             └─ t_containment ─────────────────────┘     │
            t_clusters ── t_winners ── t_report ◄── t_dup_dirs ◄── t_dirs┘
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dedup_spark.config import DEFAULT_CONFIG, PipelineConfig
from dedup_spark.operators import banding, cc, containment, exact, pairs as pairs_op
from dedup_spark.operators import report as report_op
from dedup_spark.operators import rollup, skew, validity, verify, winners
from dedup_spark.sources.store import ParquetStore, StageResult, make_store


@dataclass
class PipelineRun:
    store: ParquetStore
    results: list[StageResult] = field(default_factory=list)

    def ran(self, name: str) -> bool:
        return any(r.name == name and not r.skipped for r in self.results)


def run_pipeline(
    spark: SparkSession,
    images: DataFrame,
    store_root: str,
    run_id: str | None = None,
    cfg: PipelineConfig = DEFAULT_CONFIG,
    recompute_phash: bool = True,
) -> PipelineRun:
    store = make_store(spark, store_root, run_id, cfg.fingerprint())
    run = PipelineRun(store=store)

    def stage(name: str, compute) -> DataFrame:
        if store.is_done(name):
            run.results.append(StageResult(name, -1, skipped=True))
            return store.read(spark, name)
        df = compute()
        run.results.append(store.write(name, df))
        return store.read(spark, name)

    t_valid = stage("t_valid", lambda: validity.filter_valid(images))
    stage("t_invalid", lambda: validity.invalid_rows(images))

    from dedup_spark.operators.signatures import compute_signatures

    t_sigs = stage(
        "t_sigs",
        lambda: compute_signatures(t_valid, cfg, recompute_phash=recompute_phash),
    )

    t_exact_edges = stage("t_exact_edges", lambda: exact.exact_edges(t_sigs))

    t_bands = stage("t_bands", lambda: banding.band_table(t_sigs, cfg))

    def _salted():
        salted, skew_report = skew.salted_bands(t_bands, cfg)
        stage("t_skew_report", lambda: skew_report)
        return salted

    t_salted = stage("t_salted", _salted)

    t_cand = stage("t_cand_pairs", lambda: pairs_op.candidate_pairs(t_salted))

    def _containment():
        pair_df, skipped = containment.containment_stage(t_sigs, cfg)
        stage("t_containment_skipped", lambda: skipped)
        return pair_df

    t_contain = stage("t_containment", _containment)

    t_verified = stage(
        "t_verified",
        lambda: verify.verify_pairs(
            pairs_op.union_pairs(t_cand, t_contain), t_sigs, cfg
        ),
    )

    def _edges():
        return (
            verify.verified_edges(t_verified)
            .unionByName(t_exact_edges.select("a", "b"))
            .unionByName(t_contain.select("a", "b"))
            .dropDuplicates(["a", "b"])
        )

    def _clusters():
        nodes = t_sigs.select("image_id")
        return cc.connected_components(_edges(), nodes)

    t_clusters = stage("t_clusters", _clusters)

    t_winners = stage("t_winners", lambda: winners.select_winners(t_clusters))

    t_dirs = stage("t_dirs", lambda: rollup.dir_digests(t_sigs))
    t_dup_dirs = stage("t_dup_dirs", lambda: rollup.dup_dirs(t_dirs))

    def _report():
        sup = rollup.suppressed_members(t_sigs, t_dup_dirs)
        return report_op.image_report(t_winners, sup)

    stage("t_report", _report)
    stage("t_dir_report", lambda: report_op.dir_report(t_dup_dirs))
    return run


def cluster_table(spark: SparkSession, store_root: str) -> DataFrame:
    """Convenience: read the final cluster assignment of a finished run."""
    return spark.read.parquet(f"{store_root}/t_winners")


__all__ = ["run_pipeline", "PipelineRun", "cluster_table"]

_ = F  # imported for future per-stage expressions
