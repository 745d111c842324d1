"""Streaming ANN index maintenance: the Structured-Streaming face of
``operators/similarity.similarity_index_delta_assign`` (its batch twin).

A production ingest keeps the IVF-PQ codebooks FIXED between rebuilds
(that invariance is what makes encode-at-ingest sound — the batch twin's
pytest proves base∪delta == full rebuild), so a streaming ingest needs no
state at all: every arriving vector is cell-assigned and PQ-encoded by
pure per-row expressions against the codebooks, which are small enough
(k_cells + n_codes rows of dim doubles) to embed as literal arrays in the
plan — the streaming equivalent of a broadcast join, with zero shuffle
and zero stateful operators.  Window functions are not available on
streams; the per-row argmin/argmax is therefore an ``array_sort`` over a
codebook-sized array of structs, which is also exactly how a hand-rolled
encoder would run on a 1000-executor cluster: O(k) work per row inside
whole-stage codegen.

Posting-list merge metadata (the batch twin's ``n_cell_after``) is sink
territory in streaming: aggregate ``groupBy(cell).count()`` per
micro-batch in ``foreachBatch`` and MERGE into the stored index — see
tests/test_streaming.py for the drive.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_PQ_M = 4  # keep in lockstep with operators/similarity.py
_PQ_K = 16


def _lit_vec(xs) -> F.Column:
    return F.array(*[F.lit(float(x)) for x in xs])


def _dot(a: F.Column, b: F.Column) -> F.Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def stream_index_assign(
    vectors: DataFrame, cents: DataFrame, seeds: DataFrame
) -> DataFrame:
    """Assign + PQ-encode a (possibly streaming) ``(vec_id, embedding)``
    frame against persisted codebooks, per-row and stateless.

    ``cents``: (cell, ce array<double>) coarse centroids; ``seeds``:
    (cid, c array<double>) PQ codebook.  Both are COLLECTED to the driver
    (bounded by construction: the coarse book is k rows, the PQ book
    n_codes rows — a few KiB) and embedded as literal arrays, so the
    streaming plan has no join, no shuffle, no state; swap-on-rebuild is
    a query restart with new literals, exactly how production rolls a new
    codebook version.

    Semantics are pinned to the batch twin bit-for-bit (pytest): cell =
    argmax cosine (rounded 6dp, ties to the lowest cell — encoded as an
    ascending sort on (1.0 - sim, cell), monotone because sims are
    rounded first); codes = per-subspace argmin L2 with ties to the
    lowest code id."""
    cent_rows = sorted(
        (int(r["cell"]), list(r["ce"])) for r in cents.collect()
    )
    seed_rows = sorted((int(r["cid"]), list(r["c"])) for r in seeds.collect())
    cents_arr = F.array(
        *[
            F.struct(F.lit(cell).alias("cell"), _lit_vec(ce).alias("ce"))
            for cell, ce in cent_rows
        ]
    )
    e = F.transform(F.col("embedding"), lambda x: x.cast("double"))

    def cos6(ce: F.Column) -> F.Column:
        return F.round(
            _dot(e, ce)
            / (F.sqrt(_dot(e, e)) * F.sqrt(_dot(ce, ce))),
            6,
        )

    best_cell = F.array_sort(
        F.transform(
            cents_arr,
            lambda c: F.struct(
                (F.lit(1.0) - cos6(c["ce"])).alias("inv"),
                c["cell"].alias("cell"),
                cos6(c["ce"]).alias("sim"),
            ),
        )
    )[0]

    def code_for(m: int) -> F.Column:
        sub_e = F.slice(e, m * _PQ_K + 1, _PQ_K)
        cands = F.array(
            *[
                F.struct(
                    _dot(
                        F.zip_with(
                            sub_e,
                            _lit_vec(c[m * _PQ_K : (m + 1) * _PQ_K]),
                            lambda x, y: x - y,
                        ),
                        F.zip_with(
                            sub_e,
                            _lit_vec(c[m * _PQ_K : (m + 1) * _PQ_K]),
                            lambda x, y: x - y,
                        ),
                    ).alias("d"),
                    F.lit(cid).alias("cid"),
                )
                for cid, c in seed_rows
            ]
        )
        return F.array_sort(cands)[0]["cid"].cast("bigint")

    return vectors.select(
        "vec_id",
        best_cell["cell"].cast("bigint").alias("cell"),
        best_cell["sim"].alias("sim"),
        *[code_for(m).alias(f"code_{m}") for m in range(_PQ_M)],
    )
