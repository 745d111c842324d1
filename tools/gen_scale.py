"""Scale-up replicator for perf experiments: builds an sfN directory by
deterministically replicating the driver's sf0.1 tables FACTOR times with
consistent key offsets (every foreign key lands in its replica's range, so
join selectivities and per-key group sizes match the source scale).

This is bench-only data (never oracle-checked, never committed): the point
is plan-shape evidence at 10x — do broadcast joins flip to SMJ cleanly, do
the dedup/CC plans stay linear — per VERDICT r2 #5.

Per-replica perturbations keep rates realistic instead of multiplying
degenerate duplicates:
* documents.text gets a replica suffix (corpus-wide dup rate stays ~sf0.1's
  instead of every doc gaining 9 identical twins); n_chars is recomputed.
* embeddings get +r/1000 on component 0 (near-dup rate stays ~constant).
* region/nation are fixed dims (25 nations is the schema, not a scale knob).

Usage:  python tools/gen_scale.py [factor] [src] [dst] [tables]
        (defaults: 10 /root/testdata/sf0.1 <repo>/.scale/sf1 all-tables;
        ``tables`` is a comma list, e.g. ``documents,events`` for the
        30x dedup-chain stress dirs where lineitem would only burn disk)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from xmlstreamprocessor_spark.session import get_session

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# key columns to shift per replica, per table: {table: {col: keyspace_table}}
# (cols sharing a keyspace shift by the same stride so joins stay aligned)
_SHIFTS = {
    "customer": {"c_custkey": "customer"},
    "supplier": {"s_suppkey": "supplier"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "orders", "o_custkey": "customer"},
    "lineitem": {
        "l_orderkey": "orders",
        "l_partkey": "part",
        "l_suppkey": "supplier",
    },
    "events": {"event_id": "events", "user_id": "customer"},
    "documents": {"doc_id": "documents"},
    "embeddings": {"vec_id": "embeddings"},
}
_FIXED = ("region", "nation")


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    dst = sys.argv[3] if len(sys.argv) > 3 else os.path.join(REPO, ".scale", "sf1")
    only = (
        {t.strip() for t in sys.argv[4].split(",") if t.strip()}
        if len(sys.argv) > 4
        else None
    )
    if only is not None:
        known = set(_FIXED) | set(_SHIFTS)
        unknown = only - known
        if unknown:  # a typo would otherwise silently skip the table
            raise SystemExit(
                f"unknown tables {sorted(unknown)}; choose from {sorted(known)}"
            )
    spark = get_session("gen-scale", master="local[8]", shuffle_partitions=32)

    def stride_of(table, col):
        df = spark.read.parquet(f"{src}/{table}.parquet")
        return df.agg(F.max(col)).first()[0] + 1

    owner = {
        "customer": ("customer", "c_custkey"),
        "supplier": ("supplier", "s_suppkey"),
        "part": ("part", "p_partkey"),
        "orders": ("orders", "o_orderkey"),
        "events": ("events", "event_id"),
        "documents": ("documents", "doc_id"),
        "embeddings": ("embeddings", "vec_id"),
    }
    strides = {ks: stride_of(t, c) for ks, (t, c) in owner.items()}
    # the customer keyspace also covers events.user_id; if synthetic user
    # ids exceed max(c_custkey), a stride from the customer table alone
    # would overlap replica user_id ranges and perturb per-user group sizes
    strides["customer"] = max(
        strides["customer"], stride_of("events", "user_id")
    )
    print("strides:", strides)

    for tname in _FIXED:
        if only is not None and tname not in only:
            continue
        spark.read.parquet(f"{src}/{tname}.parquet").write.mode("overwrite").parquet(
            f"{dst}/{tname}.parquet"
        )
        print(f"{tname}: copied")

    for tname, shifts in _SHIFTS.items():
        if only is not None and tname not in only:
            continue
        base = spark.read.parquet(f"{src}/{tname}.parquet")
        reps = []
        for r in range(factor):
            rep = base
            for col, ks in shifts.items():
                rep = rep.withColumn(
                    col, (F.col(col) + F.lit(r * strides[ks])).cast("long")
                )
            if tname == "documents" and r > 0:
                rep = rep.withColumn(
                    "text", F.concat(F.col("text"), F.lit(f" r{r}"))
                )
            if tname == "documents":
                rep = rep.withColumn(
                    "n_chars", F.length("text").cast(base.schema["n_chars"].dataType)
                )
            if tname == "embeddings" and r > 0:
                el = base.schema["embedding"].dataType.elementType.simpleString()
                rep = rep.withColumn(
                    "embedding",
                    F.concat(
                        F.array((F.element_at("embedding", 1) + r / 1000.0)
                                .cast(el)),
                        F.slice("embedding", 2, 10_000),
                    ),
                )
            reps.append(rep)
        out = reps[0]
        for rep in reps[1:]:
            out = out.unionByName(rep)
        out.repartition(32).write.mode("overwrite").parquet(f"{dst}/{tname}.parquet")
        print(f"{tname}: {factor}x written")
    spark.stop()
    print("done:", dst)


if __name__ == "__main__":
    main()
