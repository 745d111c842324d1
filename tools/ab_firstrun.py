"""Fresh-session first-run A/B of one query under a conf override.
Usage: python tools/ab_firstrun.py <query> <hugeMethodLimit> [n_runs]

NOTE: queries that scope the conf internally (dedup_semantic_prune_kmeans
via scoped_huge_method_limit) override this tool's setting for their own
execution -- both arms then measure the scoped behavior."""
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
    name, lim = sys.argv[1], sys.argv[2]
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_session("ab-firstrun")
    spark.conf.set("spark.sql.codegen.hugeMethodLimit", lim)
    spark.range(1).count()
    fn, _ = REGISTRY[name]
    walls = []
    for _ in range(n):
        clear_session_memos()
        t0 = time.perf_counter()
        fn(spark, sf_dir).count()
        walls.append(round(time.perf_counter() - t0, 3))
    print(f"{name} limit={lim}: {walls}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
