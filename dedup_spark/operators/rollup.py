"""Hierarchical prefix rollup + dup-dir detection + subsumption
(SURVEY.md §2 B24/B25) — the Spark restatement of the reference's bottom-up
directory digest recursion and child-report suppression.

dir_digest(d) is an ORDER-INSENSITIVE multiset digest of d's immediate
children's digests (file child → content digest, dir child → its own
dir_digest) — name-agnostic, so relocated-but-identical trees match, exactly
like the reference's content-based directory matching.

The multiset digest is commutative-aggregate only (no collect_list):
each child digest contributes a 60-bit term (its first 15 hex chars as an
integer), and dir_digest = sha256(sum(term) ":" xor(term) ":" count).
sum runs in decimal(38,0) (exact up to ~10^38, i.e. ≥ 10^18 children), xor
in int64 — both are partial-aggregatable with O(1) state per group, so a
prefix with 10^8 children costs a hash-agg row, not a 10^8-element array in
one task (SURVEY.md §7.4 bans unbounded collect_list; VERDICT r1 #3).
Collisions: forging equal (sum, xor, count) over 60-bit terms of sha256
output needs a birthday attack on ~2^60 — negligible for dedup grouping.
The single-process oracle (dedup_spark.oracle_ref) computes the identical
formula in pure Python.

The bottom-up recursion becomes ≤ max_depth sequential groupBy jobs (each one
shuffle on the parent prefix); max_depth is tiny (path depth), so this is a
constant number of stages regardless of row count.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def multiset_digest(digest_col: str) -> Column:
    """Commutative multiset digest over a group's digest column.

    The child digest is re-hashed (sha256) before the 60-bit term extraction
    so ANY digest string is safe — `conv` on a non-hex string would silently
    yield 0 and collapse distinct multisets of equal size."""
    rehash = f"sha2(encode({digest_col}, 'utf-8'), 256)"
    term_dec = F.expr(
        f"cast(conv(substring({rehash},1,15),16,10) as decimal(38,0))"
    )
    term_xor = F.expr(
        f"bit_xor(cast(conv(substring({rehash},1,15),16,10) as bigint))"
    )
    return F.sha2(
        F.encode(
            F.concat_ws(
                ":",
                F.sum(term_dec).cast("string"),
                term_xor.cast("string"),
                F.count("*").cast("string"),
            ),
            "utf-8",
        ),
        256,
    )


def _parent(col: str):
    # 'a/b/c' → 'a/b'; top-level ('a') → '' (dropped by callers)
    return F.when(
        F.instr(F.col(col), "/") > 0,
        F.expr(f"substring({col}, 1, length({col}) - length(substring_index({col}, '/', -1)) - 1)"),
    ).otherwise(F.lit(""))


def dir_digests(sigs: DataFrame) -> DataFrame:
    """sigs(image_id, sha256, depth) → (dir, level, dir_digest) for every
    prefix directory, computed level-by-level from the deepest up."""
    entries = sigs.select(
        _parent("image_id").alias("dir"), F.col("sha256").alias("digest")
    ).where(F.col("dir") != "")
    entries = entries.withColumn("level", F.size(F.split("dir", "/")))

    max_level = entries.agg(F.max("level")).collect()[0][0] or 0
    out: DataFrame | None = None
    for lvl in range(max_level, 0, -1):
        cur = entries.where(F.col("level") == lvl)
        rest = entries.where(F.col("level") != lvl)
        dirs = cur.groupBy("dir").agg(
            multiset_digest("digest").alias("dir_digest")
        )
        lv = dirs.withColumn("level", F.lit(lvl))
        out = lv if out is None else out.unionByName(lv)
        if lvl > 1:
            up = dirs.select(
                _parent("dir").alias("dir"), F.col("dir_digest").alias("digest")
            ).where(F.col("dir") != "")
            up = up.withColumn("level", F.size(F.split("dir", "/")))
            entries = rest.unionByName(up)
        # materialize per level for DEEP trees only: each level's plan nests
        # the previous shuffles, but ≤3 levels of nesting is cheaper than a
        # checkpoint job per level (exchange reuse covers the shared scans)
        entries = entries.localCheckpoint() if lvl > 1 and max_level > 3 else entries
    if out is None:
        return sigs.sparkSession.createDataFrame(
            [], "dir string, dir_digest string, level int"
        )
    return out.select("dir", "dir_digest", "level")


def _ancestors(col: str):
    """Array of proper ancestor prefixes of a path column."""
    return F.expr(
        f"transform(sequence(1, size(split({col}, '/')) - 1),"
        f" i -> array_join(slice(split({col}, '/'), 1, i), '/'))"
    )


def dup_dirs(dirs: DataFrame) -> DataFrame:
    """Dup prefix-groups (>1 dir with equal digest), outermost only (B25).

    A dup dir with a dup-dir ancestor is subsumed — the reference reports
    only the outermost duplicated directory of a nested chain.

    Shuffle shape: the dirs table has one row per DIRECTORY (orders of
    magnitude below the image count), so group sizes come from windows (one
    shuffle each, no agg+join round trip) and the dup-dir side of every
    membership join is broadcast — at 10^12 images the dup-dir list is
    bounded by distinct prefixes, and if it ever outgrew a broadcast the
    joins degrade gracefully to shuffles.
    """
    w = Window.partitionBy("dir_digest")
    grouped = dirs.withColumn("n_dirs", F.count("*").over(w)).where(
        "n_dirs > 1"
    )
    anc = grouped.select(
        "dir", "dir_digest", F.explode(_ancestors("dir")).alias("anc")
    )
    sub = anc.join(
        F.broadcast(grouped.select(F.col("dir").alias("anc")).distinct()),
        "anc",
        "left_semi",
    ).select("dir").distinct()
    outermost = grouped.join(F.broadcast(sub), "dir", "left_anti")
    # a group stays reportable only while ≥2 outermost members remain
    return (
        outermost.withColumn("n_out", F.count("*").over(w))
        .where("n_out > 1")
        .select("dir", "dir_digest", "level")
    )


def suppressed_members(sigs: DataFrame, dup_dirs_df: DataFrame) -> DataFrame:
    """image_ids under any dup dir (their file-level reports are subsumed).

    Uses ALL dup dirs (incl. nested ones' ancestors) via the outermost set:
    membership under an outermost dup dir covers the nested ones too.
    """
    anc = sigs.select(
        "image_id", F.explode(_ancestors("image_id")).alias("anc")
    )
    return (
        anc.join(
            F.broadcast(dup_dirs_df.select(F.col("dir").alias("anc")).distinct()),
            "anc",
            "left_semi",
        )
        .select("image_id")
        .distinct()
    )
