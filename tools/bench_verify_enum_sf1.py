#!/usr/bin/env python3
"""r11: A/B of _verify_jaccard's dense-candidate sub-routes at sf1.

After the _jaccard_pairs_auto chooser fix no registered query reaches the
dense postings verify at sf1 naturally (the chooser enumerates instead),
so this drives `_jaccard_pairs_prefix(order='df')` DIRECTLY — the exact
plan the pre-r11 kernel ran (30.9 M candidates -> verify) — and compares
the verify's two dense sub-routes:

  equi_joins  — _VERIFY_ENUM_FACTOR = inf: cand x postings_a x
                postings_b (the pre-r11 dense plan, ~1.6 B join rows)
  cost_routed — factor 1.0 (landed default): the pruned-corpus postings
                SELF-join (sum(df^2) rows) inner-joined to the candidates

This is the mid-regime protection story: candidates past the 1 M arrays
knee but a corpus whose co-occurrence volume undercuts cand x avg_len —
e.g. LSH/winnowing candidate sets on dup-dense corpora.

Arms interleaved cold x3, pair sets asserted identical.
Usage: python tools/bench_verify_enum_sf1.py [sf_dir] (default .scale/sf1)
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

import xmlstreamprocessor_spark.operators.dedup as dd  # noqa: E402
from xmlstreamprocessor_spark.session import get_session  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else ".scale/sf1"
    spark = get_session("xsp-verify-enum")
    spark.range(100).select(F.sum("id")).collect()
    golden = None
    walls: dict[str, list[float]] = {"equi_joins": [], "cost_routed": []}
    for rnd in range(3):
        for name, factor in (("equi_joins", float("inf")),
                             ("cost_routed", 1.0)):
            dd.clear_session_memos()
            dd._VERIFY_ENUM_FACTOR = factor
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
    dd._VERIFY_ENUM_FACTOR = 1.0
    for name, ws in walls.items():
        print(f"{name}: median {statistics.median(ws):.2f}s of "
              f"{[round(w, 2) for w in ws]}", flush=True)


if __name__ == "__main__":
    main()
