"""Streaming sequence packer — the Structured Streaming twin of
``operators/packing.pack_sequences_plan``.

Batch packing can use a corpus-wide prefix sum; a stream cannot (future
token counts are unknown).  The production pattern is per-writer greedy
binning: each shard (writer partition) owns an open chunk; an arriving
document either fits or seals the chunk and opens the next.  State per
shard is two integers — O(1), the same contract as the reference's
bounded-memory forward-only parse (Parser.cs:119-208: single pass, no
lookback).

Chunk ids are shard-local ``(shard, chunk_seq)`` pairs: no global counter,
no cross-shard coordination, so the operator scales out by the shard key
exactly like any stateful streaming op.  The greedy kernel is shared with
the batch twin (``pack_batch_greedy``) so streaming-vs-batch equivalence is
testable exactly (see tests/test_streaming.py; timeout-free — deterministic
under availableNow drains per the project's streaming-test rules).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StructField, StructType

PACK_OUTPUT = StructType(
    [
        StructField("shard", LongType()),
        StructField("doc_id", LongType()),
        StructField("n_tokens", LongType()),
        StructField("chunk_seq", LongType()),
        StructField("offset_in_chunk", LongType()),
    ]
)

# state: (chunk_seq, tokens_used_in_open_chunk)
PACK_STATE = StructType(
    [StructField("chunk_seq", LongType()), StructField("used", LongType())]
)


def _greedy_assign(
    shard: int,
    docs: pd.DataFrame,
    cap: int,
    chunk_seq: int,
    used: int,
) -> tuple[pd.DataFrame, int, int]:
    """Assign docs (sorted by doc_id) to shard-local chunks; returns the
    assignment frame and the carried-over (chunk_seq, used) state."""
    rows = []
    for doc_id, n in zip(docs["doc_id"], docs["n_tokens"]):
        n = int(n)
        if used > 0 and used + n > cap:
            chunk_seq += 1
            used = 0
        rows.append((shard, int(doc_id), n, chunk_seq, used))
        used += n
    out = pd.DataFrame(
        rows, columns=["shard", "doc_id", "n_tokens", "chunk_seq", "offset_in_chunk"]
    ).astype("int64")
    return out, chunk_seq, used


def _make_pack_fn(cap: int):
    def _fn(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (shard,) = key
        chunk_seq, used = state.get if state.exists else (0, 0)
        docs = pd.concat(list(pdfs)).sort_values("doc_id")
        out, chunk_seq, used = _greedy_assign(shard, docs, cap, chunk_seq, used)
        state.update((chunk_seq, used))
        yield out

    return _fn


def pack_stream_stateful(
    docs: DataFrame, cap: int = 2048, shard_col: str = "shard"
) -> DataFrame:
    """Greedy streaming packer: ``docs`` is a streaming DataFrame with
    columns (shard, doc_id, n_tokens); output assigns each doc a
    shard-local (chunk_seq, offset_in_chunk).  NoTimeout: chunk boundaries
    depend only on data, never wall clock."""
    return (
        docs.select(shard_col, "doc_id", "n_tokens")
        .groupBy(shard_col)
        .applyInPandasWithState(
            _make_pack_fn(cap),
            outputStructType=PACK_OUTPUT,
            stateStructType=PACK_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def pack_batch_greedy(docs: DataFrame, cap: int = 2048) -> DataFrame:
    """Batch twin running the identical greedy kernel from empty state —
    equal to the streaming result for any batch split, because the kernel
    is associative over (chunk_seq, used) state carry."""

    def _fn(pdf: pd.DataFrame) -> pd.DataFrame:
        out, _, _ = _greedy_assign(
            int(pdf["shard"].iloc[0]), pdf.sort_values("doc_id"), cap, 0, 0
        )
        return out

    return docs.select("shard", "doc_id", "n_tokens").groupBy("shard").applyInPandas(
        _fn, schema=PACK_OUTPUT
    )
