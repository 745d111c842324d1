"""Whole-surface benchmark: run EVERY registered query once (COLD —
session memos cleared per query) at
$SPARK_GRAFT_SF_DIR (default sf0.1) and write BENCH_EXTENDED.md sorted by
cost — the breadth-plus-throughput record behind the 30-query headline set
(`bench.py`, median-of-3, is the driver-facing regression gate; this file is
the coverage evidence and hot-spot worklist).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from xmlstreamprocessor_spark.operators import REGISTRY  # noqa: E402
from xmlstreamprocessor_spark.operators.dedup import (  # noqa: E402
    clear_session_memos,
)
from xmlstreamprocessor_spark.session import get_session  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_session("xsp-bench-extended")
    spark.range(1).count()

    rows = []
    for name in sorted(REGISTRY):
        fn, _ = REGISTRY[name]
        clear_session_memos()  # same cold protocol as bench.py — every
        # wall is a self-contained cost, no cross-query memo hits
        t0 = time.perf_counter()
        try:
            n = fn(spark, sf_dir).count()
            wall = time.perf_counter() - t0
            rows.append((name, round(wall, 3), n, ""))
        except Exception as e:  # noqa: BLE001
            rows.append((name, -1.0, 0, str(e).splitlines()[0][:80]))
        print(f"# {rows[-1]}", file=sys.stderr)

    rows.sort(key=lambda r: -r[1])
    total = round(sum(r[1] for r in rows if r[1] > 0), 1)
    out = [
        "# BENCH_EXTENDED — every registered query, single run",
        "",
        f"sf dir `{sf_dir}`, local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}], "
        f"{len(rows)} queries, total {total} s (single-run, cold plans — the "
        "headline `bench.py` set uses median-of-3; regenerate with "
        "`python tools/bench_extended.py`).  Treat per-query walls as "
        "order-of-magnitude only: ambient VM load swings single runs "
        "±50% (observed totals 134–197 s for identical code), hitting "
        "the iterative/multi-job chains hardest; BASELINE.md's "
        "median-of-3 protocol is the regression reference.  The TOTAL "
        "also grows super-linearly with registry size by design: every "
        "queries() entry is self-contained per the driver contract, so "
        "each dedup/graph REPORT query (drop list, keeper, histogram, "
        "purity, overlap, sweep) independently recomputes the shared "
        "Jaccard-edge + connected-components chain it aggregates "
        "(~4-5 s each at sf0.1); a production pipeline computes that "
        "chain once and derives every report from it - exactly what "
        "the registered dedup_report_bundle query does (r9: all eight "
        "reports from one chain, ~one chain's wall).",
        "",
        "| query | sec | rows | error |",
        "|---|---|---|---|",
    ]
    out += [f"| {n} | {s if s >= 0 else 'ERR'} | {c} | {e} |" for n, s, c, e in rows]
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH_EXTENDED.md",
    )
    with open(path, "w") as f:
        f.write("\n".join(out) + "\n")
    errs = [r[0] for r in rows if r[1] < 0]
    print(f"wrote BENCH_EXTENDED.md ({len(rows)} queries, {total}s total)"
          + (f"; ERRORS: {errs}" if errs else ""))
    spark.stop()


if __name__ == "__main__":
    main()
