"""Measure the BPE trainer at production-shaped k (r11 verdict #1).

The registered oracle query trains k=10 merges; a real tokenizer runs
tens of thousands (Sennrich et al., ACL'16).  This tool drives
``bpe_train`` at k=100/500 over the sf-dir vocabulary and records the
two claims the r12 design makes:

* FLAT per-iteration walls — no geometric planning growth (the r11
  lesson) and no overlay-depth growth (the compaction bound): compare
  the mean wall of the first and last deciles.
* SUB-VOCAB write volume — total bytes written to scratch across the
  whole train, vs the r11 design's k * (vocab + counts snapshots)
  equivalent (estimated from the final compacted snapshot sizes).

Write volume is observed exactly: every scratch dir's size is summed
the moment the trainer drops it (plus whatever survives the run), via
wrappers around dedup.scratch_path/drop_scratch — the same seam the
slice-write pytest spies on.

Usage: python tools/bench_bpe_k.py [k] [sf_dir] [--synth N] [--batch-m M] [--alpha W]
One JSON line on stdout; per-merge walls (round wall / merges applied
that round — multi-merge batching, r13) to BENCH_BPE_K_LATEST.json.
``--batch-m 1`` measures the pre-r13 sequential behavior.

``--synth N``: the sf-dir corpora have only ~30 distinct words (merge
pressure exhausts at ~89 — measured), so the k=500 regime needs a
bigger vocabulary.  --synth feeds the trainer a DETERMINISTIC synthetic
(freq, seg) vocabulary of N distinct pseudo-words (md5-derived letters,
Zipf-shaped frequencies) via the ``docs=`` seam — the same code path,
honest data volumes, no corpus re-read.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import xmlstreamprocessor_spark.operators.dedup as dd  # noqa: E402
from xmlstreamprocessor_spark.operators.textops import bpe_train  # noqa: E402
from xmlstreamprocessor_spark.session import get_session  # noqa: E402


def dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(root, f))
            except OSError:
                pass
    return total


def synth_vocab(spark, n: int, alpha: int = 16):
    """N distinct pseudo-words with Zipf-shaped frequencies, derived
    deterministically from md5(id), so pair diversity is realistic and
    two runs build the identical vocabulary.  ``alpha`` picks the
    letter-alphabet width: 16 (the original hex-translate, 8..17-letter
    words) or up to 26 (each md5 byte mapped mod alpha onto a..,
    8..16-letter words) — the knob behind the addendum-B claim that
    batch width is conflict-density-bound: a wider alphabet spreads the
    Zipf head over more symbols, so the count-invariant prefix is
    longer and batches widen."""
    from pyspark.sql import functions as F

    if alpha == 16:
        w = F.substring(
            F.translate(
                F.md5(F.col("id").cast("string").cast("binary")),
                "0123456789",
                "ghijklmnop",
            ),
            1,
            (8 + F.col("id") % 10).cast("int"),
        )
    else:
        # byte i of md5 -> chr(97 + byte % alpha); word length 8..16
        # keeps i*2-1+2 <= 32 inside the hex digest
        w = F.expr(
            "concat_ws('', transform(sequence(1, int(8 + id % 9)),"
            " i -> char(97 + cast(conv(substring("
            "md5(cast(cast(id as string) as binary)), i*2-1, 2),"
            f" 16, 10) as int) % {alpha})))"
        )
    return (
        spark.range(n)
        .select(
            (F.floor(F.lit(float(n)) / (F.col("id") + 1)) + 1)
            .cast("bigint")
            .alias("freq"),
            w.alias("w"),
        )
        .groupBy("w")
        .agg(F.sum("freq").alias("freq"))
        .select(
            "freq",
            F.concat(
                F.lit("|"), F.regexp_replace("w", "(.)", "$1|")
            ).alias("seg"),
        )
    )


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    rest = sys.argv[2:]
    synth_n = 0
    if "--synth" in rest:
        i = rest.index("--synth")
        synth_n = int(rest[i + 1])
        rest = rest[:i] + rest[i + 2:]
    from xmlstreamprocessor_spark.operators.textops import _BPE_BATCH_M

    batch_m = _BPE_BATCH_M
    if "--batch-m" in rest:
        i = rest.index("--batch-m")
        batch_m = int(rest[i + 1])
        rest = rest[:i] + rest[i + 2:]
    alpha = 16
    if "--alpha" in rest:
        i = rest.index("--alpha")
        alpha = int(rest[i + 1])
        rest = rest[:i] + rest[i + 2:]
    sf_dir = rest[0] if rest else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    spark = get_session("xsp-bpe-k")
    spark.range(1).count()

    state = {"written": 0, "paths": []}
    real_scratch, real_drop = dd.scratch_path, dd.drop_scratch

    def scratch(s):
        p = real_scratch(s)
        state["paths"].append(p)
        return p

    def drop(p):
        lp = dd._local_path(p)
        if lp is not None and os.path.exists(lp):
            state["written"] += dir_bytes(lp)
        real_drop(p)

    dd.scratch_path, dd.drop_scratch = scratch, drop
    walls: list[float] = []  # PER-MERGE walls (round wall / merges in
    # round — the hook fires once per driver round-trip since the r13
    # multi-merge batching, with the rank of the round's LAST merge)
    rounds: list[list[float]] = []  # (merges_in_round, round_wall)
    setup = [0.0]
    prev = [time.perf_counter()]
    prev_rank = [0]

    def hook(rank: int) -> None:
        now = time.perf_counter()
        if rank == 0:  # setup boundary: base vocab + initial counts
            setup[0] = round(now - prev[0], 3)
        else:
            n_in_round = rank - prev_rank[0]
            wall = now - prev[0]
            rounds.append([n_in_round, round(wall, 3)])
            walls.extend([round(wall / n_in_round, 4)] * n_in_round)
        prev[0] = now
        prev_rank[0] = rank

    docs = synth_vocab(spark, synth_n, alpha) if synth_n else None
    t0 = time.perf_counter()
    try:
        merges, wf = bpe_train(
            spark, sf_dir, k=k, docs=docs, batch_m=batch_m, iter_hook=hook,
            # this tool measures the DISTRIBUTED overlay trainer (write
            # volume, per-round walls) — bypass the r14 small-vocab
            # driver route so the measured path is the measured claim
            driver_vocab_max=0,
        )
        n_merges = merges.count()
        vocab_rows = wf.count()
    finally:
        dd.scratch_path, dd.drop_scratch = real_scratch, real_drop
    total = time.perf_counter() - t0
    # paths that were never dropped (the returned vocab snapshot)
    live = 0
    for p in set(state["paths"]):
        lp = dd._local_path(p)
        if lp is not None and os.path.exists(lp):
            live += dir_bytes(lp)
    vocab_snapshot = live  # what survives IS the final compacted vocab
    written_total = state["written"] + live
    # a corpus with no mergeable pair produces zero rounds (the trainer
    # breaks before the first hook) — report zeros, never IndexError
    dec = max(1, len(walls) // 10)
    first_dec = sum(walls[:dec]) / dec if walls else 0.0
    last_dec = sum(walls[-dec:]) / dec if walls else 0.0
    summary = {
        "metric": "bpe_train_k",
        "k": k,
        "batch_m": batch_m,
        "alpha": alpha,
        "rounds": len(rounds),
        "sec_per_round_median": round(
            sorted(r[1] for r in rounds)[len(rounds) // 2], 3
        ) if rounds else 0.0,
        "merges_produced": n_merges,
        "vocab_rows": vocab_rows,
        "sf": sf_dir,
        "total_sec": round(total, 2),
        "setup_sec": setup[0],
        "sec_per_iter_median": round(
            sorted(walls)[len(walls) // 2], 3
        ) if walls else 0.0,
        "sec_per_iter_first_decile_mean": round(first_dec, 3),
        "sec_per_iter_last_decile_mean": round(last_dec, 3),
        "flat_ratio_last_over_first": round(
            last_dec / first_dec, 3
        ) if first_dec else 0.0,
        "bytes_written_total": written_total,
        "bytes_final_vocab_snapshot": vocab_snapshot,
        "bytes_r11_design_equiv": 2 * k * vocab_snapshot,
        "write_volume_vs_r11": round(
            written_total / max(1, 2 * k * vocab_snapshot), 4
        ),
    }
    side = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "..",
        "BENCH_BPE_K_LATEST.json",
    )
    with open(side, "w") as f:
        json.dump(
            {**summary, "per_iter_walls": walls, "round_walls": rounds},
            f,
            indent=1,
        )
    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()
