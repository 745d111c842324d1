"""sf3 stress of the similarity/ANN family (r9 verdict #4): the one heavy
family never pushed past sf1.  Runs the IVF build (full-corpus coarse
assignment), the multiprobe top-k, the residual IVFADC probe, the
two-stage rerank, the PQ encode pass, and the index bundle at a given
scale dir, printing one JSON line per query with wall and row count.

Expectation to check (not assume): every chain is linear in the corpus —
the query side is a fixed 10 vectors, centroid/codebook tables broadcast,
and the cell equi-join is the only corpus shuffle.  A knee here would
mean a compile-time broadcast of something corpus-sized or a per-task
buffer growing with cell population — exactly the class of defect the r9
sf3 stress found in the dedup verify path.

Usage: python tools/bench_ann_sf3.py [sf_dir]
       (default .scale/sf3emb — build with
        ``python tools/gen_scale.py 30 /root/testdata/sf0.1 .scale/sf3emb
        embeddings``)
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from xmlstreamprocessor_spark.session import get_session

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

QUERIES = [
    "similarity_ivf_assign_cells",
    "similarity_ivf_cell_balance",
    "similarity_topk_ivf_multiprobe",
    "embedding_pq_encode",
    "similarity_topk_ivfpq_residual_adc",
    "similarity_topk_ivfpq_rerank",
    "similarity_recall_vs_exact",
    "similarity_index_bundle",
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, ".scale", "sf3emb"
    )
    spark = get_session()
    n_vecs = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    print(json.dumps({"sf_dir": sf_dir, "n_vectors": n_vecs}), flush=True)
    # shared runner: per-query error containment, cold memos, JSON lines
    import bench_family_stress

    bench_family_stress.run(spark, sf_dir, QUERIES)


if __name__ == "__main__":
    main()
