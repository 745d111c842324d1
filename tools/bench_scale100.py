"""100x stress tier (r13 verdict #5): the brief's bar is 100x, the
family-stress standard was 30x — this runs the heaviest family rows at
BOTH tiers in one serialized session (same-session walls, so the
exponent is not an ambient artifact) and records each row's scaling
exponent  log(w100/w30) / log(100/30)  plus output boundedness.

Rows:
* dedup_containment_delta_prefix — the in-query prefix-artifact build
  (per-ingest-epoch in production) + statically-pruned probe;
* dedup_minhash_lsh_pairs — banded candidate generation, the dedup
  family's scale workhorse;
* mix_dsir_importance_resample — one map-side-combinable corpus pass
  collapsed to a 256-bucket model, then map-only scoring;
* dedup_semantic_prune_kmeans at k ∝ corpus (the SemDeDup deployment
  rule: ~1 cluster per 600 docs here — k=100 at 30x, k=333 at 100x)
  plus a fixed-k=1000 row at 30x for the r13-verdict-#2 claim that the
  Lloyd anchor stage no longer dominates at production k (the greedy
  k-center anchors at k=100 measured 138.7 s anchor-dominated in the
  r13 addendum C; bounded Lloyd iterations are ~flat in k).

Usage: python tools/bench_scale100.py [sf30_dir] [sf100_dir]
       (defaults: <repo>/.scale/sf3 <repo>/.scale/sf10)
One JSON line per row; summary table to stdout at the end.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from xmlstreamprocessor_spark.operators import REGISTRY  # noqa: E402
from xmlstreamprocessor_spark.operators.dedup import (  # noqa: E402
    clear_session_memos,
)
from xmlstreamprocessor_spark.operators.similarity import (  # noqa: E402
    dedup_semantic_prune_kmeans,
)
from xmlstreamprocessor_spark.session import get_session  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

QUERIES = [
    "dedup_containment_delta_prefix",
    "dedup_minhash_lsh_pairs",
    "mix_dsir_importance_resample",
]


WARM_SF = "/root/testdata/sf0.1"


def _warm(spark, fn):
    """Run the callable once at sf0.1 and DISCARD the wall: JIT/codegen
    warm-up is per plan shape, and without this the whole session's
    warm-up lands on the first timed 30x wall and biases every exponent
    downward (code-review r14: the smoke run measured the 3.3x-larger
    tier 2-3x FASTER — physically impossible scaling)."""
    clear_session_memos()
    try:
        fn(spark, WARM_SF).count()
    except Exception:  # noqa: BLE001 — warm-up failures surface in _run
        pass


def _run(spark, fn, sf_dir):
    clear_session_memos()
    t0 = time.time()
    try:
        n = fn(spark, sf_dir).count()
        return {"rows": n, "wall_sec": round(time.time() - t0, 2)}
    except Exception as e:  # noqa: BLE001 — a stress FAILURE is the finding
        return {"error": str(e)[:300], "wall_sec": round(time.time() - t0, 2)}


def main() -> None:
    sf30 = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, ".scale", "sf3"
    )
    sf100 = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        REPO, ".scale", "sf10"
    )
    spark = get_session("xsp-scale100")
    spark.range(1).count()
    out = []
    for name in QUERIES:
        fn, _ = REGISTRY[name]
        _warm(spark, fn)
        r30 = _run(spark, fn, sf30)
        print(json.dumps({"query": name, "tier": "30x", **r30}), flush=True)
        r100 = _run(spark, fn, sf100)
        print(json.dumps({"query": name, "tier": "100x", **r100}), flush=True)
        out.append((name, r30, r100))
    # semantic prune, k ∝ corpus (plus the fixed-k=1000 anchor row)
    sem = [
        ("dedup_semantic_prune_kmeans k=100 (k∝N)", sf30, "30x", 100),
        ("dedup_semantic_prune_kmeans k=1000 (anchor stress)", sf30,
         "30x", 1000),
        ("dedup_semantic_prune_kmeans k=333 (k∝N)", sf100, "100x", 333),
    ]
    sem_rows = {}
    for label, d, tier, k in sem:
        fn = lambda s, sf, k=k: dedup_semantic_prune_kmeans(s, sf, k=k)  # noqa: E731
        _warm(spark, fn)
        r = _run(spark, fn, d)
        print(json.dumps({"query": label, "tier": tier, **r}), flush=True)
        sem_rows[label] = r
    summary = {"metric": "scale100_stress", "rows": []}
    for name, r30, r100 in out:
        row = {"query": name, "wall_30x": r30.get("wall_sec"),
               "wall_100x": r100.get("wall_sec"),
               "rows_30x": r30.get("rows"), "rows_100x": r100.get("rows")}
        if "rows" in r30 and "rows" in r100 and r30["wall_sec"]:
            row["exponent"] = round(
                math.log(r100["wall_sec"] / r30["wall_sec"])
                / math.log(100 / 30),
                3,
            )
        summary["rows"].append(row)
    k30 = sem_rows.get("dedup_semantic_prune_kmeans k=100 (k∝N)", {})
    k100 = sem_rows.get("dedup_semantic_prune_kmeans k=333 (k∝N)", {})
    if "rows" in k30 and "rows" in k100 and k30.get("wall_sec"):
        summary["rows"].append({
            "query": "dedup_semantic_prune_kmeans (k∝N)",
            "wall_30x": k30["wall_sec"], "wall_100x": k100["wall_sec"],
            "rows_30x": k30.get("rows"), "rows_100x": k100.get("rows"),
            "exponent": round(
                math.log(k100["wall_sec"] / k30["wall_sec"])
                / math.log(100 / 30), 3),
        })
    summary["sem_anchor_rows"] = sem_rows
    with open(os.path.join(REPO, "BENCH_SCALE100_LATEST.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()
