"""Isolate the t_sigs arm (VERDICT r2 #6): time ONLY the signature stage
over a pre-generated input at a given core count, varying the vectorized
parquet reader batch size and the UDF task count, each in a fresh JVM.

The question: is the 4-core arm's 2.62x ratio (vs 16c, n=3.2M) a tunable
(columnarReaderBatchSize=256 was tuned against G1 humongous-allocation
collapse at 32 tasks — possibly too small for 2 feeder threads) or the
host's memory-bandwidth ceiling (already bounded by jobs/bench_membw.py)?

Usage: python jobs/profile_sigs.py <input_parquet> <cores> [reader_batch]
                                   [udf_tasks]
Prints one JSON line {cores, reader_batch, udf_tasks, sec, rows}.
"""

from __future__ import annotations

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def main() -> None:
    input_path = sys.argv[1]
    cores = int(sys.argv[2])
    reader_batch = int(sys.argv[3]) if len(sys.argv) > 3 else 256
    udf_tasks = int(sys.argv[4]) if len(sys.argv) > 4 else 0  # 0 = cores/2

    from dedup_spark import session as sess
    from dedup_spark.session import get_spark

    if udf_tasks:
        sess.py_parallelism = lambda spark: udf_tasks  # type: ignore

    spark = get_spark(
        app=f"profile_sigs_{cores}",
        master=f"local[{cores}]",
        extra_conf={
            "spark.sql.parquet.columnarReaderBatchSize": str(reader_batch)
        },
    )
    from dedup_spark.operators.signatures import compute_signatures
    from dedup_spark.operators.validity import filter_valid

    images = filter_valid(spark.read.parquet(input_path))
    t0 = time.perf_counter()
    sigs = compute_signatures(images)
    # same sink shape as the pipeline's stage commit minus the metrics job:
    # a real write barrier so every row is computed and serialized
    sigs.write.format("noop").mode("overwrite").save()
    sec = round(time.perf_counter() - t0, 2)
    print(
        json.dumps(
            {
                "cores": cores,
                "reader_batch": reader_batch,
                "udf_tasks": udf_tasks or f"default({cores}//2)",
                "sec": sec,
            }
        ),
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
