#!/usr/bin/env python3
"""r9 verdict tasks #5 and #7: the two unmeasured claims about the
bucketed persisted postings (BASELINE.md §5 addendum A).

#5 — backfill separation at sf1: the r8 addendum showed the two probe
protocols TIE at 10% / 0.1% deltas because the delta's prefix broadcasts
either way.  The structural claim was that with a BACKFILL-sized delta
(>= 50% of the corpus, prefix above the broadcast threshold) the arrays
probe must shuffle the full corpus postings while the bucketed table's
scan already satisfies the join distribution.  This measures exactly that
shape and records the join strategy each plan actually picked.

#7 — c2 at 30x: per-ingest cost is c1*delta + c2*corpus-scan; the sf3
documents dir (30x sf0.1) at 10% and 0.1% deltas gives the c2 data point
(compare against the sf1 walls at the same delta fractions).

Pair KERNEL only (jaccard_pairs_delta -> count), median of 3 memo-cleared
runs, persisted base artifacts built untimed per configuration — the same
serialized quiet protocol as tools/bench_delta_sf1.py.
"""

from __future__ import annotations

import os
import shutil
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from xmlstreamprocessor_spark.operators.dedup import (  # noqa: E402
    clear_session_memos,
    df_stats_for,
    jaccard_pairs_delta,
    persist_postings,
    shingle_sets,
)
from xmlstreamprocessor_spark.operators.registry import t  # noqa: E402
from xmlstreamprocessor_spark.session import get_session  # noqa: E402


def measure(spark, sf_dir: str, is_delta, label: str, workdir: str) -> None:
    shutil.rmtree(workdir, ignore_errors=True)
    docs = t(spark, sf_dir, "documents")
    t0 = time.perf_counter()
    shingle_sets(docs.filter(~is_delta)).write.parquet(f"{workdir}/shingles")
    stored = spark.read.parquet(f"{workdir}/shingles")
    df_stats_for(stored).write.parquet(f"{workdir}/df_stats")
    spark.sql("DROP TABLE IF EXISTS xsp_r9_postings")
    persist_postings(stored, "xsp_r9_postings", f"{workdir}/postings")
    print(
        f"# {label}: persisted-base setup (untimed) "
        f"{time.perf_counter() - t0:.1f}s",
        file=sys.stderr,
        flush=True,
    )
    for proto, kwargs in (
        ("arrays probe (r7 protocol)", {}),
        (
            "bucketed postings (r8 protocol)",
            {"base_postings": spark.table("xsp_r9_postings")},
        ),
    ):
        walls, n, out = [], 0, None
        for _ in range(3):
            clear_session_memos()
            t0 = time.perf_counter()
            out = jaccard_pairs_delta(
                spark,
                None,
                0.5,
                docs=docs,
                is_delta=is_delta,
                base_shingle_sets=spark.read.parquet(f"{workdir}/shingles"),
                df_stats=spark.read.parquet(f"{workdir}/df_stats"),
                **kwargs,
            )
            n = out.count()
            walls.append(time.perf_counter() - t0)
        plan = out._jdf.queryExecution().executedPlan().toString()
        print(
            f"{label} | {proto}: {statistics.median(walls):.2f}s "
            f"median of {[round(w, 2) for w in walls]} ({n} pairs) "
            f"[SMJ={plan.count('SortMergeJoin')} "
            f"BHJ={plan.count('BroadcastHashJoin')} "
            f"Exch={plan.count('Exchange')}]",
            flush=True,
        )
    spark.sql("DROP TABLE IF EXISTS xsp_r9_postings")
    shutil.rmtree(workdir, ignore_errors=True)


def main() -> None:
    spark = get_session("xsp-delta-r9")
    spark.range(1).count()
    sf1 = "/root/repo/.scale/sf1"
    sf3 = "/root/repo/.scale/sf3"
    work = "/tmp/xsp_delta_r9"
    # task #5: backfill-sized delta at sf1 (50% of the corpus)
    measure(spark, sf1, (F.col("doc_id") % 2) == 1, "sf1 50% backfill", work)
    # task #7: the 30x data points at the addendum-A delta fractions
    measure(spark, sf3, (F.col("doc_id") % 10) == 7, "sf3 10% delta", work)
    measure(
        spark, sf3, (F.col("doc_id") % 1000) == 7, "sf3 0.1% delta", work
    )
    spark.stop()


if __name__ == "__main__":
    main()
