"""Mega-bucket diagnosis + capped-routing measurement for the MinHash
LSH chain at a stress tier (r14: the uncapped 100x verify OOMed local
spill disk — the replicated corpus merges near-dup groups across
replicas into band mega-buckets, so candidate volume goes quadratic in
the replication factor).

Runs, in one serialized session:
1. the ``dedup_lsh_band_stats`` cost gate (aggregate-only — completes at
   any tier) and prints total/max candidate volume per band, i.e. the
   evidence the production router consumes BEFORE the band join;
2. ``_lsh_pairs(bucket_cap=CAP)`` — the routed path — with wall and
   verified-pair count.

Usage: python tools/diag_minhash_cap.py [sf_dir] [cap]
       (defaults: <repo>/.scale/sf10 32)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from xmlstreamprocessor_spark.operators import REGISTRY  # noqa: E402
from xmlstreamprocessor_spark.operators.dedup import (  # noqa: E402
    _lsh_pairs,
    clear_session_memos,
)
from xmlstreamprocessor_spark.session import get_session  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, ".scale", "sf10"
    )
    cap = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    spark = get_session("xsp-minhash-cap")
    spark.range(1).count()

    clear_session_memos()
    t0 = time.time()
    stats = REGISTRY["dedup_lsh_band_stats"][0](spark, sf_dir).collect()
    gate = {
        "gate_wall_sec": round(time.time() - t0, 2),
        "cand_pairs_total": int(sum(r["cand_pairs"] for r in stats)),
        "max_bucket": int(max(r["max_bucket"] for r in stats)),
        "buckets_multi_total": int(
            sum(r["n_buckets_multi"] for r in stats)
        ),
    }
    print(json.dumps({"stage": "band_stats_gate", "sf": sf_dir, **gate}),
          flush=True)

    clear_session_memos()
    t0 = time.time()
    n = _lsh_pairs(spark, sf_dir, bucket_cap=cap).count()
    print(json.dumps({
        "stage": "capped_pairs", "sf": sf_dir, "bucket_cap": cap,
        "verified_pairs": n, "wall_sec": round(time.time() - t0, 2),
    }), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
