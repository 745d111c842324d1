"""dedup_substring_spans must equal a brute-force reference: maximal runs
of 8-word shingles occurring in >= 2 distinct documents (cross-doc only),
recomputed in pure Python on the sf0.001 corpus."""

import re


def _brute_spans(rows, k=8):
    docs = {r["doc_id"]: re.split(r"\s+", r["text"].strip()) for r in rows}
    where = {}
    for did, ws in docs.items():
        for i in range(max(len(ws) - k + 1, 0)):
            where.setdefault(" ".join(ws[i : i + k]), set()).add(did)
    dup = {g for g, ds in where.items() if len(ds) >= 2}
    spans = set()
    for did, ws in docs.items():
        starts = [
            i
            for i in range(max(len(ws) - k + 1, 0))
            if " ".join(ws[i : i + k]) in dup
        ]
        run = []
        for i in starts + [None]:
            if run and (i is None or i != run[-1] + 1):
                spans.add((did, run[0], run[-1] + k - 1, run[-1] + k - run[0]))
                run = []
            if i is not None:
                run.append(i)
    return spans


def test_spans_match_bruteforce(spark):
    from xmlstreamprocessor_spark.operators.dedup import dedup_substring_spans

    sf = "/root/testdata/sf0.001"
    got = {
        (r["doc_id"], r["span_start"], r["span_end"], r["span_words"])
        for r in dedup_substring_spans(spark, sf).collect()
    }
    rows = spark.read.parquet(f"{sf}/documents.parquet").select(
        "doc_id", "text"
    ).collect()
    want = _brute_spans(rows)
    assert got == want
    assert len(want) > 0  # non-vacuous: the corpus has shared passages
    # spans within a doc never overlap (maximal islands)
    by_doc = {}
    for did, s, e, _ in sorted(got):
        assert all(s > pe for pe in by_doc.get(did, [])), (did, s)
        by_doc.setdefault(did, []).append(e)
