#!/usr/bin/env python3
"""r12: addendum-H resolution — re-run the dense-verify shingling-persist
A/B inside a CANARY-CERTIFIED quiet window (r11 verdict #3).

The r11 A/B (persist the pruned-corpus shingling DISK_ONLY vs recompute
it per consumer) was ambient-inconclusive: both arms swung 52-148 s on
identical code.  This harness re-runs it with the bench.py ambient
canary sampled BEFORE, BETWEEN ROUNDS, and AFTER — a run only counts if
every canary reading sits inside the calibrated band, so the medians are
quiet-window medians by construction, not by hope.

Same drive as bench_verify_enum_sf1.py: `_jaccard_pairs_prefix(order=
'df')` at sf1 forces the dense verify (30.9 M candidates); arms
interleave cold x3; pair sets asserted identical.

Usage: python tools/bench_verify_persist_ab.py [sf_dir]  (default .scale/sf1)
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

import xmlstreamprocessor_spark.operators.dedup as dd  # noqa: E402
from bench import CANARY_BAND, CANARY_REF_SEC, _canary  # noqa: E402
from xmlstreamprocessor_spark.session import get_session  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else ".scale/sf1"
    spark = get_session("xsp-verify-persist-ab")
    spark.range(100).select(F.sum("id")).collect()
    lo, hi = CANARY_BAND[0] * CANARY_REF_SEC, CANARY_BAND[1] * CANARY_REF_SEC
    canaries = [_canary(spark)]
    print(f"canary[pre]: {canaries[0]}s (band {lo:.2f}-{hi:.2f})", flush=True)
    golden = None
    walls: dict[str, list[float]] = {"persist": [], "recompute": []}
    for rnd in range(3):
        for name, knob in (("persist", True), ("recompute", False)):
            dd.clear_session_memos()
            dd._VERIFY_PERSIST_SH = knob
            t0 = time.perf_counter()
            got = {
                (r["doc_a"], r["doc_b"], r["jaccard"])
                for r in dd._jaccard_pairs_prefix(
                    spark, sf_dir, 0.5, order="df"
                ).collect()
            }
            w = time.perf_counter() - t0
            walls[name].append(w)
            if golden is None:
                golden = got
            assert got == golden, f"{name} mismatch: {len(got)} vs {len(golden)}"
            print(f"round{rnd} {name}: {w:.2f}s ({len(got)} pairs)", flush=True)
        canaries.append(_canary(spark))
        print(f"canary[after round{rnd}]: {canaries[-1]}s", flush=True)
    dd._VERIFY_PERSIST_SH = False
    quiet = all(lo <= c <= hi for c in canaries)
    out = {
        "metric": "verify_persist_ab",
        "sf": sf_dir,
        "persist_walls": [round(w, 2) for w in walls["persist"]],
        "recompute_walls": [round(w, 2) for w in walls["recompute"]],
        "persist_median": round(statistics.median(walls["persist"]), 2),
        "recompute_median": round(statistics.median(walls["recompute"]), 2),
        "canaries": canaries,
        "canary_band": [round(lo, 2), round(hi, 2)],
        "ambient_quiet": quiet,
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
