#!/usr/bin/env python3
"""r9 wall measurements (serialized quiet protocol, median of 3
memo-cleared runs in one warm session):

* cold medians for the round-9 queries (hetero-meta pair, report bundle)
  and the XML queries whose physical plan changed this round
  (array-capture first-occurrence-wins; Arrow UDTFs);
* the text_tfidf_top_terms adjudication row (r8 verdict #3);
* an Arrow vs pickled-row A/B for both UDTF queries (r8 verdict #4) —
  the registered queries run the default (pickled rows after the r9
  flip); the Arrow twin is produced by forcing use_arrow=True through
  the same registered query code.

Usage: python tools/bench_r9_walls.py [sf_dir] [--sf1-subset]
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

FULL = [
    "xml_roundtrip_hetero_meta",
    "xml_roundtrip_hetero_meta_jvm",
    "dedup_report_bundle",
    "xml_roundtrip_orders_struct",
    "xml_roundtrip_orders_struct_jvm",
    "xml_roundtrip_wildcard_tag_events",
    "xml_roundtrip_wildcard_tag_events_jvm",
    "xml_roundtrip_lineitem_array",
    "xml_udtf_orders_struct",
    "xml_udtf_lineitem_array",
    "text_tfidf_top_terms",
]
SF1_SUBSET = [
    "xml_roundtrip_hetero_meta",
    "xml_roundtrip_hetero_meta_jvm",
    "dedup_report_bundle",
    "xml_udtf_orders_struct",
    "xml_udtf_lineitem_array",
]


def walls_for(spark, sf_dir, name, runs=3):
    fn, _ = REGISTRY[name]
    walls, n = [], 0
    for _ in range(runs):
        clear_session_memos()
        t0 = time.perf_counter()
        n = fn(spark, sf_dir).count()
        walls.append(time.perf_counter() - t0)
    print(
        f"{name}: {statistics.median(walls):.2f}s median of "
        f"{[round(w, 2) for w in walls]} ({n} rows)",
        flush=True,
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    names = SF1_SUBSET if "--sf1-subset" in sys.argv else FULL
    spark = get_session("xsp-r9-walls")
    spark.range(1).count()
    print(f"# sf_dir={sf_dir}", flush=True)
    for name in names:
        walls_for(spark, sf_dir, name)

    # Arrow vs pickled-row A/B for the two UDTF queries.  The registered
    # queries use the DEFAULT (pickled rows since the r9 flip), so the
    # forced arm here is use_arrow=True — the Arrow configuration the
    # default run no longer exercises.
    import xmlstreamprocessor_spark.sources.udtf as um

    orig_struct, orig_array = um.xml_struct_udtf, um.xml_array_udtf
    um.xml_struct_udtf = (
        lambda root, strict_ns=False, on_error="fail", use_arrow=False:
        orig_struct(root, strict_ns, on_error, use_arrow=True)
    )
    um.xml_array_udtf = (
        lambda pat, inner, strict_ns=False, on_error="fail", use_arrow=False:
        orig_array(pat, inner, strict_ns, on_error, use_arrow=True)
    )
    try:
        print("# --- use_arrow=True A/B ---", flush=True)
        for name in ("xml_udtf_orders_struct", "xml_udtf_lineitem_array"):
            walls_for(spark, sf_dir, name)
    finally:
        um.xml_struct_udtf, um.xml_array_udtf = orig_struct, orig_array
    spark.stop()


if __name__ == "__main__":
    main()
