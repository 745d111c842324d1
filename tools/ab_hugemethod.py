"""A/B: spark.sql.codegen.hugeMethodLimit 8000 vs 65535 on the heavy
bench queries, interleaved ABAB in ONE session so ambient drift hits both
arms equally.  Usage: python tools/ab_hugemethod.py [query ...]"""
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

# NOTE (r14): tokenizer_bpe_train_k_merges now routes its ~30-row sf
# vocab to the driver-side merge loop, so it no longer exercises the
# distributed fold chains this A/B was written for; and queries that
# scope the conf internally (dedup_semantic_prune_kmeans) neutralize
# the override.  Pass explicit query names for meaningful arms.
QUERIES = sys.argv[1:] or [
    "tokenizer_bpe_encode_corpus",
    "mix_dsir_importance_resample",
    "dedup_containment_delta_prefix",
    "graph_dup_group_sizes",
]
N = int(os.environ.get("AB_RUNS", "3"))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_session("ab-hugemethod")
    spark.range(1).count()
    for name in QUERIES:
        fn, _ = REGISTRY[name]
        walls = {"8000": [], "65535": []}
        # one discarded warm-up per query so first-run session warmup
        # (codegen cache, worker pool) doesn't land on either arm
        clear_session_memos()
        t0 = time.perf_counter()
        fn(spark, sf_dir).count()
        warm = time.perf_counter() - t0
        for i in range(2 * N):
            lim = "8000" if i % 2 == 0 else "65535"
            spark.conf.set("spark.sql.codegen.hugeMethodLimit", lim)
            clear_session_memos()
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            walls[lim].append(round(time.perf_counter() - t0, 3))
        spark.conf.set("spark.sql.codegen.hugeMethodLimit", "8000")
        print(
            f"{name}: warmup {warm:.1f}s  "
            f"8000={walls['8000']} med {statistics.median(walls['8000']):.3f}  "
            f"65535={walls['65535']} med {statistics.median(walls['65535']):.3f}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
