"""Generic scale-stress runner: run named registered queries against a
scale dir (cold memos, serialized) and print one JSON line per query —
the same protocol as tools/bench_ann_sf3.py, parameterized so each round
can push the stress to a chain earlier rounds did not cover (the r9
practice that found two real scale bugs).

Usage: python tools/bench_family_stress.py <sf_dir> <query> [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from xmlstreamprocessor_spark.session import get_session


def run(spark, sf_dir: str, names) -> None:
    """Cold-run each named query against ``sf_dir``, one JSON line per
    query; a per-query failure becomes an error row (a stress FAILURE is
    the finding), never an aborted sweep.  Shared by the per-family
    stress entry points (tools/bench_ann_sf3.py delegates here)."""
    from xmlstreamprocessor_spark.operators import REGISTRY
    from xmlstreamprocessor_spark.operators.dedup import clear_session_memos

    for name in names:
        clear_session_memos()
        fn, _ = REGISTRY[name]
        t0 = time.time()
        try:
            n = fn(spark, sf_dir).count()
            out = {"query": name, "rows": n,
                   "wall_sec": round(time.time() - t0, 2)}
        except Exception as e:  # noqa: BLE001
            out = {"query": name, "error": str(e)[:300],
                   "wall_sec": round(time.time() - t0, 2)}
        print(json.dumps(out), flush=True)


def main() -> None:
    run(get_session(), sys.argv[1], sys.argv[2:])


if __name__ == "__main__":
    main()
