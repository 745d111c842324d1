#!/usr/bin/env python3
"""sf1 walls for the incremental pair-graph chain (r6 verdict task #5).

Measures, at the 10x scale dir (`.scale/sf1`, built by tools/gen_scale.py):

* ``dedup_pairs_delta``             — delta-prefix x postings exact pairs
* ``graph_components_incremental``  — delta pairs + star-merge into base CC
* ``graph_dup_group_sizes``         — the FULL recompute chain they replace

The point is the ratio: per-ingest incremental cost must be well under the
full rebuild.  Median of 3 cold runs (session memos cleared), same protocol
as bench.py.  Results are recorded in BASELINE.md §5.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from xmlstreamprocessor_spark.operators import REGISTRY  # noqa: E402
from xmlstreamprocessor_spark.operators.dedup import (  # noqa: E402
    clear_session_memos,
)
from xmlstreamprocessor_spark.session import get_session  # noqa: E402

QUERIES = [
    "dedup_pairs_delta",
    "graph_components_incremental",
    "graph_dup_group_sizes",
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scale/sf1"
    spark = get_session("xsp-delta-sf1")
    spark.range(1).count()
    for name in QUERIES:
        fn, _ = REGISTRY[name]
        walls = []
        for _ in range(3):
            clear_session_memos()
            t0 = time.perf_counter()
            n = fn(spark, sf_dir).count()
            walls.append(time.perf_counter() - t0)
        med = statistics.median(walls)
        print(
            f"{name}: {med:.2f}s median of {[round(w, 2) for w in walls]}"
            f" ({n} rows)"
        )
    spark.stop()


if __name__ == "__main__":
    main()
