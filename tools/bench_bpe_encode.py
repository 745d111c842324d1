"""Measure the BPE ENCODE path at production-shaped merge-table sizes
(r13 verdict #3).

The registered query encodes with a k=10 merge table; a real tokenizer
replays tens of thousands of merges.  The pre-r14 encode replayed the
table as ONE expression chain (bpe_apply_expr) — the right map-only
shape at k=10, but a k-deep expression tree through analysis/codegen at
production k.  ``bpe_apply_frame`` bounds it: chunks of ``chunk_m``
folds with a parquet materialize cut between chunks (the lineage-cut
lesson, third application).  This tool records the two claims:

* FLAT per-merge encode wall as the merge table grows — wall(j)/j for
  j along a ladder up to k, first vs last ratio;
* the UNBOUNDED chain's contrast walls on the same ladder (capped at
  ``--chain-cap`` — the point of the fix is that this variant's
  analysis cost grows superlinearly), with a checksum equality pin
  between both variants at every measured j.

The merge table is trained HONESTLY (same trainer, synthetic Zipf
vocabulary through the ``docs=`` seam — the sf corpora's 30 distinct
words exhaust merge pressure at ~89); the encode target is the same
vocabulary re-segmented from raw characters, materialized once to
scratch so every measurement starts from a stored frame.

Usage: python tools/bench_bpe_encode.py [k] [--synth N] [--chunk M]
           [--ladder 250,500,1000,2000] [--chain-cap J] [--alpha W]
One JSON line on stdout; full rows to BENCH_BPE_ENCODE_LATEST.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

import xmlstreamprocessor_spark.operators.dedup as dd  # noqa: E402
from xmlstreamprocessor_spark.operators.textops import (  # noqa: E402
    _BPE_APPLY_CHUNK,
    bpe_apply_expr,
    bpe_apply_frame,
    bpe_train,
)
from xmlstreamprocessor_spark.session import get_session  # noqa: E402

from bench_bpe_k import synth_vocab  # noqa: E402


def _checksum(frame):
    """Order-insensitive content digest of a (freq, seg) frame: row
    count, total seg length, and a crc32 sum — enough to pin the two
    apply variants produce identical segmentations."""
    r = frame.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.length("seg")).alias("chars"),
        F.sum(F.crc32(F.concat_ws("#", "seg", "freq"))).alias("crc"),
    ).first()
    return (r["n"], r["chars"], r["crc"])


def main() -> None:
    ap = argparse.ArgumentParser(description="BPE encode-path bench")
    ap.add_argument("k", nargs="?", type=int, default=2000)
    ap.add_argument("--synth", type=int, default=30000)
    ap.add_argument("--chunk", type=int, default=_BPE_APPLY_CHUNK)
    ap.add_argument("--ladder", default="100,250,500,1000,2000")
    ap.add_argument("--chain-cap", type=int, default=500)
    ap.add_argument("--alpha", type=int, default=16)
    ap.add_argument("--merges-file", default=None, help=(
        "json cache of the trained merge table: written after a train, "
        "read instead of re-training when it exists (the k=2000 train "
        "costs ~30 min — the ladder, not the train, is the measurement)"
    ))
    ns = ap.parse_args()
    ladder = [int(x) for x in ns.ladder.split(",") if x]
    ladder = sorted(j for j in ladder if j <= ns.k) or [ns.k]

    spark = get_session("xsp-bpe-encode")
    spark.range(1).count()
    cached = None
    if ns.merges_file and os.path.exists(ns.merges_file):
        with open(ns.merges_file) as f:
            cached = json.load(f)
    if cached is not None:
        rows = cached
        train_sec = 0.0
        print(f"# loaded {len(rows)} merges from {ns.merges_file}",
              file=sys.stderr)
    else:
        t0 = time.perf_counter()
        merges, _wf = bpe_train(
            spark, None, k=ns.k, docs=synth_vocab(spark, ns.synth, ns.alpha)
        )
        rows = [r.asDict() for r in merges.orderBy("merge_rank").collect()]
        train_sec = round(time.perf_counter() - t0, 1)
        print(f"# trained {len(rows)} merges in {train_sec}s",
              file=sys.stderr)
        if ns.merges_file:
            with open(ns.merges_file, "w") as f:
                json.dump(rows, f)

    # encode target: raw-character segmentation, stored once
    base_path = dd.scratch_path(spark)
    synth_vocab(spark, ns.synth, ns.alpha).write.parquet(base_path)
    base = spark.read.parquet(base_path)

    out_rows = []
    try:
        for j in ladder:
            t0 = time.perf_counter()
            enc = bpe_apply_frame(base, rows[:j], chunk_m=ns.chunk)
            ck_chunked = _checksum(enc)
            w_chunked = round(time.perf_counter() - t0, 2)
            row = {
                "j_merges": j,
                "chunked_wall_sec": w_chunked,
                "chunked_sec_per_merge": round(w_chunked / j, 4),
            }
            if j <= ns.chain_cap:
                # the unbounded single-chain variant FAILS ANALYSIS past
                # a few hundred folds (Max iterations reached for batch
                # Resolution, measured at j=250) — that failure is the
                # r13-verdict evidence, recorded as a row field instead
                # of killing the ladder
                t0 = time.perf_counter()
                try:
                    chain = base.withColumn(
                        "seg", bpe_apply_expr(rows[:j], F.col("seg"))
                    )
                    ck_chain = _checksum(chain)
                    row["chain_wall_sec"] = round(
                        time.perf_counter() - t0, 2
                    )
                    row["chain_sec_per_merge"] = round(
                        row["chain_wall_sec"] / j, 4
                    )
                    row["checksum_equal"] = ck_chain == ck_chunked
                except Exception as e:  # noqa: BLE001
                    row["chain_error"] = str(e)[:160]
                    row["chain_fail_sec"] = round(
                        time.perf_counter() - t0, 2
                    )
            out_rows.append(row)
            print(f"# {row}", file=sys.stderr)
    finally:
        dd.drop_scratch(base_path)

    per = [r["chunked_sec_per_merge"] for r in out_rows]
    summary = {
        "metric": "bpe_encode_k",
        "k_trained": len(rows),
        "chunk_m": ns.chunk,
        "synth_n": ns.synth,
        "alpha": ns.alpha,
        "train_sec": train_sec,
        "ladder": out_rows,
        "chunked_per_merge_first": per[0],
        "chunked_per_merge_last": per[-1],
        "flat_ratio_last_over_first": round(per[-1] / per[0], 3)
        if per[0]
        else 0.0,
        # None (never asserted) when --chain-cap excluded every ladder
        # point — a default-true would claim a pin that never ran
        # (code-review r14)
        "checksums_equal": (
            all(r["checksum_equal"] for r in out_rows if "checksum_equal" in r)
            if any("checksum_equal" in r for r in out_rows)
            else None
        ),
    }
    side = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "..",
        "BENCH_BPE_ENCODE_LATEST.json",
    )
    with open(side, "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()
