"""Local mirror of the driver's correctness gate: run every
``__spark_entry__.queries()`` entry and its ``oracle_sql()`` twin on the same
parquet tables, compare row count + order-insensitive values.

Usage:
    python tools/check_correctness.py            # all queries @ sf0.01
    python tools/check_correctness.py q1 topk    # substring-filtered subset
    SF_DIR=/root/testdata/sf0.001 python tools/check_correctness.py
"""

from __future__ import annotations

import datetime
import decimal
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def canon_value(v):
    if v is None:
        return "\0NULL"
    if isinstance(v, bool):
        return f"b:{v}"
    if isinstance(v, decimal.Decimal):
        return f"n:{format(v.normalize(), 'f')}"
    if isinstance(v, float):
        if math.isnan(v):
            return "f:nan"
        if v == int(v) and abs(v) < 1e15:
            return f"n:{int(v)}"
        return f"f:{v!r}"
    if isinstance(v, int):
        return f"n:{v}"
    if isinstance(v, datetime.datetime):
        return f"t:{v.replace(tzinfo=None).isoformat()}"
    if isinstance(v, datetime.date):
        return f"d:{v.isoformat()}"
    if isinstance(v, bytes):
        return f"y:{v.hex()}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon_value(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}={canon_value(v[k])}" for k in sorted(v)) + "}"
    return f"s:{v}"


def canon_rows(cols: list[str], rows) -> list[str]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(canon_value(r[i]) for i in order) for r in rows)


def main() -> int:
    sf = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
    filters = sys.argv[1:]

    import __spark_entry__ as m
    from xmlstreamprocessor_spark.session import get_session

    spark = get_session("oracle-check", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

    qs, oracles = m.queries(), m.oracle_sql()
    names = [n for n in qs if not filters or any(f in n for f in filters)]
    passed = failed = rows_only = 0
    for name in names:
        t0 = time.time()
        try:
            sdf = qs[name](spark, sf)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL  {name}: spark error: {str(e).splitlines()[0][:200]}")
            failed += 1
            continue
        sql = oracles.get(name)
        if sql is None:
            print(f"rows  {name}: {len(srows)} rows (no oracle) [{time.time()-t0:.1f}s]")
            rows_only += 1
            continue
        try:
            ores = con.sql(sql)
            ocols = ores.columns
            orows = ores.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {str(e).splitlines()[0][:200]}")
            failed += 1
            continue
        problems = []
        if len(srows) != len(orows):
            problems.append(f"rowcount spark={len(srows)} duckdb={len(orows)}")
        if sorted(c.lower() for c in scols) != sorted(c.lower() for c in ocols):
            problems.append(f"columns spark={sorted(scols)} duckdb={sorted(ocols)}")
        if not problems:
            sc, oc = canon_rows(scols, srows), canon_rows(ocols, orows)
            if sc != oc:
                diffs = [(a, b) for a, b in zip(sc, oc) if a != b]
                extra_s = [x for x in sc if x not in set(oc)][:2]
                extra_o = [x for x in oc if x not in set(sc)][:2]
                problems.append(
                    f"values differ ({len(diffs)} of {len(sc)} rows); "
                    f"spark-only={extra_s} duckdb-only={extra_o}"
                )
        if problems:
            print(f"FAIL  {name}: {'; '.join(problems)} [{time.time()-t0:.1f}s]")
            failed += 1
        else:
            print(f"ok    {name}: {len(srows)} rows [{time.time()-t0:.1f}s]")
            passed += 1
    print(
        f"\n{passed} ok, {failed} failed, {rows_only} rows-only, "
        f"{len(names)} total (sf={sf})"
    )
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
