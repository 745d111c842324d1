#!/usr/bin/env python3
"""r9: container-to-document byte-ratio sensitivity of the below-root
hybrid (`extract_xml_jvm` span path) vs the Python iterparse kernel.

The registered `xml_roundtrip_hetero_meta` pair builds ~150-byte
documents whose wildcard `<meta>` container is ~40% of the bytes — at
that ratio the hybrid's narrow-column win cannot show (it pays from_xml
on the full document AND the Arrow kernel on 40% of it; measured walls
tie at sf1, 4.84 s hybrid vs 5.06 s python).  The hybrid's claim is
"Python cost scales with the CONTAINER's bytes, not the document's", so
this measures the same GenericTest spec shape while growing the FIXED
fields (a padded `<note>` element) so the container shrinks to ~10% and
~4% of the document.  Median of 3 cold runs per (ratio, engine) at
sf0.1, serialized quiet protocol.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from xmlstreamprocessor_spark.operators.registry import t  # noqa: E402
from xmlstreamprocessor_spark.plans import X  # noqa: E402
from xmlstreamprocessor_spark.session import get_session  # noqa: E402
from xmlstreamprocessor_spark.sources.xml_batch import (  # noqa: E402
    extract_xml,
    extract_xml_jvm,
)


def doc_expr(pad_repeats: int):
    """The registered hetero doc plus a fixed `<note>` of ~15*pad bytes."""
    return F.concat(
        F.lit('<order id="'), F.col("o_orderkey").cast("string"),
        F.lit('"><note>'), F.repeat(F.col("o_orderpriority"), pad_repeats),
        F.lit("</note><prio>"), F.col("o_orderpriority"),
        F.lit("</prio><total>"),
        F.round(F.col("o_totalprice"), 2).cast("string"),
        F.lit("</total><meta><s_"), F.col("o_orderstatus"),
        F.lit("><n>"), F.col("o_custkey").cast("string"),
        F.lit("</n></s_"), F.col("o_orderstatus"),
        F.lit("><p_"), F.substring("o_orderpriority", 1, 1),
        F.lit("/></meta></order>"),
    )


def spec():
    return X.struct(
        "order",
        {
            "order_id": X.attr("id"),
            "note": X.string("note"),
            "prio": X.string("prio"),
            "total": X.ndecimal("total"),
            "meta": X.array(
                "meta", X.struct("*", {"kind": X.tag(), "n": X.nint("n")})
            ),
        },
    )


def doc_expr_fields(nfields: int):
    """The hetero doc plus nfields extra small typed fixed fields — the
    kernel pays per ELEMENT (iterparse event + slot fill), the hybrid's
    from_xml parses them JVM-side with its span-regexp cost unchanged."""
    parts = [
        F.lit('<order id="'), F.col("o_orderkey").cast("string"), F.lit('">'),
    ]
    for k in range(nfields):
        parts += [
            F.lit(f"<f{k}>"),
            ((F.col("o_custkey") + k) % 1000).cast("string"),
            F.lit(f"</f{k}>"),
        ]
    parts += [
        F.lit("<prio>"), F.col("o_orderpriority"),
        F.lit("</prio><total>"),
        F.round(F.col("o_totalprice"), 2).cast("string"),
        F.lit("</total><meta><s_"), F.col("o_orderstatus"),
        F.lit("><n>"), F.col("o_custkey").cast("string"),
        F.lit("</n></s_"), F.col("o_orderstatus"),
        F.lit("><p_"), F.substring("o_orderpriority", 1, 1),
        F.lit("/></meta></order>"),
    ]
    return F.concat(*parts)


def spec_fields(nfields: int):
    d = {"order_id": X.attr("id")}
    for k in range(nfields):
        d[f"f{k}"] = X.nint(f"f{k}")
    d.update(
        {
            "prio": X.string("prio"),
            "total": X.ndecimal("total"),
            "meta": X.array(
                "meta", X.struct("*", {"kind": X.tag(), "n": X.nint("n")})
            ),
        }
    )
    return X.struct("order", d)


def measure(docs, sp, label: str) -> None:
    nbytes = docs.select(F.avg(F.length("doc"))).first()[0]
    for engine, fn in (
        ("python", lambda d: extract_xml(d, "doc", sp, engine="python")),
        ("hybrid", lambda d: extract_xml_jvm(d, "doc", sp)),
    ):
        walls, n = [], 0
        for _ in range(3):
            t0 = time.perf_counter()
            ex = fn(docs)
            n = ex.select(
                F.explode("meta").alias("m")
            ).filter(F.col("m.kind").isNotNull()).count()
            walls.append(time.perf_counter() - t0)
        print(
            f"{label} (~{nbytes:.0f} B/doc) | {engine}: "
            f"{statistics.median(walls):.2f}s "
            f"median of {[round(w, 2) for w in walls]} ({n} meta rows)",
            flush=True,
        )


def main() -> None:
    spark = get_session("xsp-hetero-ratio")
    spark.range(1).count()
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    o = t(spark, sf, "orders")
    # dimension 2: fixed-ELEMENT count (per-element kernel cost)
    for nf in (0, 16, 48):
        measure(
            o.select(doc_expr_fields(nf).alias("doc")),
            spec_fields(nf),
            f"nfields={nf}",
        )
    # dimension 1: fixed-BYTE padding (per-byte regexp/from_xml cost)
    for pad in (0, 20, 80):
        measure(o.select(doc_expr(pad).alias("doc")), spec(), f"pad={pad}")
    spark.stop()


if __name__ == "__main__":
    main()
