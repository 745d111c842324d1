#!/usr/bin/env python3
"""r9 follow-up to the backfill measurement (tools/bench_delta_r9.py):

The sf1 50%-backfill run showed BOTH probe protocols still broadcast the
delta's prefix (BHJ=4 each) — even half the sf1 corpus's prefix shingles
fit under the 64 MB autoBroadcastJoinThreshold, so the separation case
the bucketed layout was built for (prefix OUTGROWS broadcast, arrays
probe must shuffle the full corpus postings) cannot materialize at this
corpus size no matter the delta fraction.

This run disables broadcast joins for the session
(autoBroadcastJoinThreshold=-1) to measure the exact plan shape a 100 TB
corpus forces: with broadcast unavailable, the arrays probe must
EXCHANGE its exploded corpus postings into the join distribution every
ingest, while the bucketed persisted table's scan already satisfies it
(storage-side distribution, zero corpus exchange).  Same serialized
quiet protocol as bench_delta_r9.py: pair kernel only, median of 3
memo-cleared runs, persisted base built untimed.
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


def main() -> None:
    spark = get_session("xsp-backfill-nobcast")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.range(1).count()
    sf1 = "/root/repo/.scale/sf1"
    work = "/tmp/xsp_backfill_nobcast"
    is_delta = (F.col("doc_id") % 2) == 1

    shutil.rmtree(work, ignore_errors=True)
    docs = t(spark, sf1, "documents")
    t0 = time.perf_counter()
    shingle_sets(docs.filter(~is_delta)).write.parquet(f"{work}/shingles")
    stored = spark.read.parquet(f"{work}/shingles")
    df_stats_for(stored).write.parquet(f"{work}/df_stats")
    spark.sql("DROP TABLE IF EXISTS xsp_nobcast_postings")
    persist_postings(stored, "xsp_nobcast_postings", f"{work}/postings")
    print(
        f"# setup (untimed) {time.perf_counter() - t0:.1f}s",
        file=sys.stderr,
        flush=True,
    )
    for proto, kwargs in (
        ("arrays probe (r7 protocol)", {}),
        (
            "bucketed postings (r8 protocol)",
            {"base_postings": spark.table("xsp_nobcast_postings")},
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
                base_shingle_sets=spark.read.parquet(f"{work}/shingles"),
                df_stats=spark.read.parquet(f"{work}/df_stats"),
                **kwargs,
            )
            n = out.count()
            walls.append(time.perf_counter() - t0)
        plan = out._jdf.queryExecution().executedPlan().toString()
        print(
            f"sf1 50% backfill, broadcast OFF | {proto}: "
            f"{statistics.median(walls):.2f}s "
            f"median of {[round(w, 2) for w in walls]} ({n} pairs) "
            f"[SMJ={plan.count('SortMergeJoin')} "
            f"BHJ={plan.count('BroadcastHashJoin')} "
            f"Exch={plan.count('Exchange')}]",
            flush=True,
        )
    spark.sql("DROP TABLE IF EXISTS xsp_nobcast_postings")
    shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
