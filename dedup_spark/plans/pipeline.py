"""Stage orchestrator (SURVEY.md §2 B38, §3.3): the full dedup pipeline as a
DAG of checkpointed, resumable stages.

Each stage: if the store says (run_id, stage, config_fingerprint) is done,
SKIP and read its materialized output; else compute → write → mark done.
Killing the driver between any two stages and re-running with the same
run_id resumes mid-pipeline (BASELINE.json:14), verified by tests/test_resume.

Stage graph (materialized checkpoints only; banding / exact edges / star
pairs / dir digests are views recomputed from their checkpointed parent —
cheaper than a materialization barrier):

  images ─ t_sigs ─┬─ t_salted ──────(star pairs)──┐
   (validity fused)├─(exact edges)───────────────── ├─ t_verified ─ t_rescued
                   └─ t_containment ────────────────┘        │
     t_clusters ── t_winners ── t_report ◄── t_dup_dirs ◄────┘
"""

from __future__ import annotations

import logging
import time
from concurrent.futures import CancelledError, ThreadPoolExecutor
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dedup_spark.config import DEFAULT_CONFIG, PipelineConfig
from dedup_spark.operators import banding, cc, containment, exact, pairs as pairs_op
from dedup_spark.operators import report as report_op
from dedup_spark.operators import rollup, skew, validity, verify, winners
from dedup_spark.sources.store import ParquetStore, StageResult, make_store

log = logging.getLogger("dedup_spark.pipeline")


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
    input_token: str | None = None,
    prior_sigs: DataFrame | None = None,
) -> PipelineRun:
    """``input_token`` names the input identity (Iceberg snapshot id, parquet
    path, or generator params). It is hashed into the resume fingerprint so a
    stage checkpointed against one input is never silently reused for another
    (B38 "input_snapshot"); None keeps the config-only key for callers that
    manage input identity themselves.

    ``prior_sigs`` enables INCREMENTAL runs: pass a previous run's t_sigs
    table and the signature stage decodes payloads ONLY for image_ids not
    present in it; prior rows are reused (semi-joined against the current
    snapshot, so deletes fall out too). Signature extraction is the one
    stage that touches the payload bytes — at 100 TB it dominates the job —
    so a nightly 1% append costs 1% of the decode work while every
    downstream dedup stage still sees the full corpus (near-dup clusters
    can span old and new rows, so banding onward always recomputes; those
    stages are payload-free and cheap by comparison). Callers must fold the
    prior run's identity into ``input_token``; signature-affecting config
    changes are caught by the fingerprint as usual, and prior_sigs computed
    under a different signature config must not be passed (same contract as
    the reference's digest-cache invalidation).

    Incremental reuse contract (ADVICE r2): reused rows are re-filtered
    against the METADATA validity predicates of the current snapshot (w/h/
    fmt — validity.metadata_predicate), so a row whose metadata went invalid
    drops out exactly as a from-scratch run would drop it. The payload-length
    check cannot be applied to reused rows without re-scanning the payload
    column of the whole corpus — the precise cost incremental mode exists to
    avoid — so in-place PAYLOAD edits under an unchanged image_id are
    UNSUPPORTED (the input is append/delete-only, the Iceberg snapshot
    model); the sampled re-decode audit below fails loudly on systematic
    drift, but a single silently edited payload outside the sample is not
    detected."""
    fp = cfg.fingerprint()
    if input_token is not None:
        import hashlib

        fp = hashlib.sha256(f"{fp}|{input_token}".encode()).hexdigest()
    store = make_store(spark, store_root, run_id, fp)
    run = PipelineRun(store=store)

    def stage(name: str, compute, census=None, census_on_skip=True) -> DataFrame:
        """``census=(census_name, fn)``: fn(committed_df, rows) is recorded
        into t_metrics by store.write BEFORE the manifest rename, so a done
        stage always has its approximation census (ADVICE r4). On a SKIP the
        row normally already exists (same run_id ⇒ same census file); if it
        does not — a store committed by pre-r5 code whose crash window this
        ordering closes — it is backfilled from the committed table, unless
        ``census_on_skip`` is False (censuses like the verify slack count
        that are only observable while the stage computes)."""
        if store.is_done(name):
            if (
                census is not None
                and census_on_skip
                and not store.has_census(census[0], spark)
            ):
                cname, fn = census
                store.record_census(
                    cname,
                    fn(store.read(spark, name), store.manifest_rows(name)),
                    spark,
                )
            run.results.append(StageResult(name, -1, skipped=True))
            return store.read(spark, name)
        t0 = time.perf_counter()
        df = compute()
        res = store.write(name, df, census=census)
        res.seconds = round(time.perf_counter() - t0, 2)
        run.results.append(res)
        return store.read(spark, name)

    # Leaf DIAGNOSTIC stages (nothing downstream consumes them) run on a
    # small thread pool, concurrent with the main chain (VERDICT r3 #3):
    # Spark schedules jobs submitted from multiple threads task-by-task, so
    # these thin jobs fill the executor slots the big stages leave idle at
    # their tails instead of each paying a serial commit barrier — at 16
    # cores the four diagnostics were ~8-9 s of the fixed residue that
    # capped scaling efficiency at mid input sizes. Results are appended
    # after the main chain finishes (stable submission order); any failure
    # re-raises at the join point.
    pool = ThreadPoolExecutor(max_workers=3)
    async_stages: list[tuple[str, object]] = []  # (name, Future | StageResult)

    def stage_async(name: str, compute, census=None) -> None:
        """``census`` follows the same census-before-manifest contract as
        stage(): recorded inside store.write when the stage RAN; on a skip
        the same-run_id census row normally already stands (backfilled from
        the committed table when it does not — pre-r5 stores)."""
        if store.is_done(name):
            if census is not None and not store.has_census(census[0], spark):
                cname, fn = census
                store.record_census(
                    cname,
                    fn(store.read(spark, name), store.manifest_rows(name)),
                    spark,
                )
            async_stages.append((name, StageResult(name, -1, skipped=True)))
            return

        def job() -> StageResult:
            t0 = time.perf_counter()
            res = store.write(name, compute(), census=census)
            res.seconds = round(time.perf_counter() - t0, 2)
            return res

        async_stages.append((name, pool.submit(job)))

    def join_async(failed: bool = False) -> None:
        """Collect async-stage results and reap the pool. On the FAILURE
        path (a synchronous stage raised — ADVICE r4) pending futures are
        cancelled, running ones awaited, and any async-stage exception is
        logged rather than raised so the primary error propagates and no
        non-daemon worker outlives the pipeline."""
        try:
            for name, item in async_stages:
                if isinstance(item, StageResult):
                    run.results.append(item)
                    continue
                if failed:
                    item.cancel()
                    try:
                        run.results.append(item.result())
                    except CancelledError:
                        pass
                    except Exception:
                        log.exception(
                            "async stage %s failed during pipeline failure",
                            name,
                        )
                else:
                    run.results.append(item.result())
        finally:
            pool.shutdown(wait=True)

    try:
        # validity is a VIEW fused into the signature scan, never a materialized
        # stage: the bytes column is the dominant I/O at scale (input_hint rows
        # are mostly payload), so it must be read exactly once — by the signature
        # UDF — with the validity predicates pushed into that same scan. Copying
        # a 100TB input into a t_valid table would double the pipeline's I/O for
        # zero resume value (t_sigs is the first checkpoint that matters).
        from dedup_spark.operators.signatures import compute_signatures

        def _sigs() -> DataFrame:
            base = validity.filter_valid(images)
            if prior_sigs is None:
                return compute_signatures(base, cfg, recompute_phash=recompute_phash)
            # incremental: decode only rows absent from the prior signature
            # table; keep prior rows that still exist in the current snapshot.
            # Both joins are on the thin id column — no payload crosses either.
            prior_ids = prior_sigs.select("image_id")
            fresh = compute_signatures(
                base.join(prior_ids, "image_id", "left_anti"),
                cfg,
                recompute_phash=recompute_phash,
            )
            # reuse filter: current-snapshot ids that still pass the PAYLOAD-FREE
            # validity predicates (see docstring — the length(bytes) check would
            # re-scan the corpus payload, defeating incremental). A prior row
            # whose metadata went invalid in the current snapshot drops out here,
            # matching the from-scratch run (ADVICE r2 medium).
            kept_ids = images.where(validity.metadata_predicate()).select("image_id")
            kept = prior_sigs.join(kept_ids, "image_id", "leftsemi")
            _audit_prior_sigs(base, kept)
            return fresh.unionByName(kept)

        def _audit_prior_sigs(base: DataFrame, kept: DataFrame, k: int = 64) -> None:
            """Trust-but-verify for incremental reuse: re-decode a small
            deterministic sample of REUSED rows and compare their signatures to
            the prior table. Catches the silent-wrong-reuse footgun — prior
            sigs computed under a different signature config (shingle/band/
            hash knobs), or a corrupted prior table — at the cost of ~k payload
            decodes, before a whole run is built on bad signatures. The analog
            of the reference's digest-cache invalidation, enforced on data
            rather than trusted metadata."""
            cmp_cols = ["sha256", "simhash", "phash", "n_shingles"]
            # literal id list, not a semi-join: a join filter does not reach the
            # parquet scan, so the payload column of the WHOLE input would be
            # read to audit 64 rows; an isin predicate pushes down to row-group
            # pruning. 64 short strings on the driver is nothing.
            ids = [
                r.image_id
                for r in kept.select("image_id").orderBy("image_id").limit(k).collect()
            ]
            if not ids:
                return
            redone = compute_signatures(
                base.where(F.col("image_id").isin(ids)),
                cfg,
                recompute_phash=recompute_phash,
            ).select("image_id", *[F.col(c).alias(f"new_{c}") for c in cmp_cols])
            joined = kept.select("image_id", *cmp_cols).join(redone, "image_id")
            # eqNullSafe: plain != yields NULL when either side is NULL, which
            # would drop the row from the summed indicator and let a nulled-out
            # prior signature pass the audit silently (ADVICE r2)
            differs = [
                (~F.col(c).eqNullSafe(F.col(f"new_{c}"))).cast("int")
                for c in cmp_cols
            ]
            bad = joined.where(sum(differs[1:], differs[0]) > 0).count()
            if bad:
                raise ValueError(
                    f"incremental audit failed: {bad}/{k} sampled prior "
                    "signatures do not match recomputation under the current "
                    "config — prior_sigs was built with a different signature "
                    "config or is corrupted; rerun from scratch"
                )

        t_sigs = stage("t_sigs", _sigs)

        # invalid-row diagnostics (S9 analog) by thin anti-join against the
        # signature ids: reads ONLY pruned metadata columns of the input — the
        # payload is scanned exactly once in this pipeline, by t_sigs above
        stage_async(
            "t_invalid",
            lambda: images.select("image_id", "w", "h", "fmt").join(
                t_sigs.select("image_id"), "image_id", "left_anti"
            ),
        )

        # Cheap derivations of an already-materialized stage stay VIEWS: every
        # extra stage table costs a write + read + metrics job (and at cluster
        # scale, real storage I/O); checkpoints belong at expensive-to-recompute
        # or multiply-consumed points only. banding is a posexplode of t_sigs,
        # exact edges one groupBy of it — both recompute in less time than a
        # materialization barrier costs.
        t_exact_edges = exact.exact_edges(t_sigs)

        # t_salted IS a checkpoint: it carries the banding+salt shuffle and is
        # consumed three times (hamming verifier, star pass, orphan rescue).
        # The skew report is derived FROM the materialized table afterwards —
        # one tiny groupBy over committed parquet instead of re-running banding.
        def _salted():
            salted, _ = skew.salted_bands(banding.band_table(t_sigs, cfg), cfg)
            return salted

        t_salted = stage("t_salted", _salted)
        stage_async(
            "t_skew_report",
            lambda: skew.skew_report_from_salted(t_salted, cfg),
            # durable approximation census: candidate pairs forfeited to salting
            census=(
                "salting_lost_pairs",
                lambda out, rows: out.agg(F.sum("est_lost_pairs")).collect()[0][0]
                or 0,
            ),
        )

        # Hamming families (simhash, phash) verify EXACTLY inside their buckets —
        # numpy popcount per salted group, no candidate rows, no rescue needed
        # (operators.hamming; SURVEY.md §8). Only the minhash/Jaccard family
        # goes through star candidates + join verification + orphan rescue.
        from dedup_spark.operators import hamming

        t_hamming = stage(
            "t_hamming", lambda: hamming.hamming_family_pairs(t_salted, cfg=cfg)
        )

        mh_salted = t_salted.where(F.col("family") == "minhash")
        t_cand = pairs_op.candidate_pairs(mh_salted)

        def _containment():
            pair_df, skipped = containment.containment_stage(t_sigs, cfg)
            # durable census: anchor-gram groups dropped by the group cap —
            # recorded by store.write before the nested stage's manifest, so a
            # "done" nested stage always carries it (ADVICE r4)
            stage(
                "t_containment_skipped",
                lambda: skipped,
                census=("containment_skipped_groups", lambda out, rows: rows),
            )
            return pair_df

        t_contain = stage("t_containment", _containment)
        if not any(
            r.name == "t_containment_skipped" for r in run.results
        ) and store.is_done("t_containment_skipped"):
            # the nested stage only executes inside the parent's compute, so on
            # a resume it never reaches run.results even though it exists in the
            # store and was skipped — record the skip so resume reports are
            # faithful (ADVICE r3). Its census row normally stands (same
            # run_id); backfill from the manifest when it does not — the
            # nested stage() call above never runs on this path, so its own
            # skip-backfill cannot fire (ADVICE r4 legacy-store window).
            if not store.has_census("containment_skipped_groups", spark):
                store.record_census(
                    "containment_skipped_groups",
                    store.manifest_rows("t_containment_skipped"),
                    spark,
                )
            run.results.append(StageResult("t_containment_skipped", -1, skipped=True))

        slack_census: dict[str, int] = {}
        t_verified = stage(
            "t_verified",
            lambda: verify.verify_pairs(
                pairs_op.union_pairs(t_cand, t_contain), t_sigs, cfg,
                census=slack_census,
            ),
            # durable census: captioned pairs the simhash slack gate kept away
            # from the exact-Jaccard verify. verify_pairs fills slack_census
            # EAGERLY (the count runs inside the compute), so the value is ready
            # when store.write's census hook fires; it is NOT recomputable from
            # the committed output, hence census_on_skip=False.
            census=(
                "verify_slack_skips",
                lambda out, rows: slack_census.get("slack_skips", 0),
            ),
            census_on_skip=False,
        )

        # orphan rescue (see operators.pairs): minhash-bucketed rows with
        # candidates but zero links anywhere get one capped exhaustive round.
        # "Judged" = verify output + hamming pairs + exact edges, so rows linked
        # by ANY family are not orphans and already-found pairs aren't redone.
        def _judged():
            true_col = F.lit(True).alias("verified")
            return (
                t_verified.select("a", "b", "verified")
                .unionByName(t_hamming.select("a", "b", true_col))
                .unionByName(t_exact_edges.select("a", "b", true_col))
            )

        t_rescued = stage(
            "t_rescued",
            lambda: verify.rescue_verify_pairs(
                pairs_op.orphan_rescue_pairs(
                    mh_salted, _judged(), node_ids=t_sigs.select("image_id")
                ),
                t_sigs, cfg,
            ),
        )

        def _edges():
            return (
                verify.verified_edges(t_verified)
                .unionByName(verify.verified_edges(t_rescued))
                .unionByName(t_hamming.select("a", "b"))
                .unionByName(t_exact_edges.select("a", "b"))
                .unionByName(t_contain.select("a", "b"))
                .dropDuplicates(["a", "b"])
            )

        def _clusters():
            nodes = t_sigs.select("image_id")
            return cc.connected_components(_edges(), nodes)

        t_clusters = stage("t_clusters", _clusters)

        t_winners = stage("t_winners", lambda: winners.select_winners(t_clusters))

        t_dup_dirs = stage(
            "t_dup_dirs", lambda: rollup.dup_dirs(rollup.dir_digests(t_sigs))
        )

        def _report():
            sup = rollup.suppressed_members(t_sigs, t_dup_dirs)
            return report_op.image_report(t_winners, sup)

        stage("t_report", _report)
        stage_async("t_dir_report", lambda: report_op.dir_report(t_dup_dirs))
    except BaseException:
        # a synchronous stage raised: reap the async pool NOW so its
        # non-daemon workers cannot keep running Spark jobs after the
        # pipeline has failed, and their exceptions surface in the log
        # instead of vanishing un-.result()ed (ADVICE r4); the primary
        # error propagates
        join_async(failed=True)
        raise
    join_async()
    return run


def cluster_table(spark: SparkSession, store_root: str) -> DataFrame:
    """Convenience: read the final cluster assignment of a finished run."""
    return spark.read.parquet(f"{store_root}/t_winners")


__all__ = ["run_pipeline", "PipelineRun", "cluster_table"]

_ = F  # imported for future per-stage expressions
