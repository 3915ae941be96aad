"""Build a DEGENERATE-corpus copy of a testdata SF dir for the
degenerate-input gate: every table copied byte-for-byte except
`documents.parquet` and `embeddings.parquet`, which gain rows exercising
the edge cases the repo treats as in-contract (the xs40/xs48 review-bug
class).  Documents rows:

  * NULL text
  * empty-string text
  * whitespace-only text (tokenizes to zero non-empty tokens)
  * single-token text
  * repeated-whitespace text (split() artifacts)
  * a one-character doc and a NULL lang / NULL source row

Running the full oracle compare on this corpus
(`python tools/check_correctness.py --sf-dir .bench_sf/degen`) catches
two bug classes the standard corpora cannot witness, because they
contain no such rows:

  1. Spark-side crashes on degenerate arrays (negative slice lengths,
     descending sequence(1,0), element_at on empties) — the xs48 class;
  2. cross-engine NULL-semantics divergence (Spark vs DuckDB skipping
     NULLs differently in denominators) — the xs40 class.

Usage:  python tools/make_degenerate.py [SRC_SF_DIR] [OUT_DIR]
Defaults: /root/testdata/sf0.001 -> .bench_sf/degen
"""

from __future__ import annotations

import os
import shutil
import sys

import pyarrow as pa
import pyarrow.parquet as pq

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

# (text, lang, source) triples; doc_id and n_chars derived below.
# lang/source NULLs included: group-by-lang/source analyzers must agree
# with the oracle on NULL grouping keys too.
DEGENERATE_DOCS = [
    (None, "en", "degen"),
    ("", "en", "degen"),
    ("   ", "en", "degen"),
    ("\t \n ", "en", "degen"),
    ("solo", "en", "degen"),
    ("a", "en", "degen"),
    ("two  tokens", "en", "degen"),      # doubled space: split artifact
    (" leading trailing ", "en", "degen"),
    ("alpha beta gamma", None, "degen"),  # NULL lang
    ("alpha beta gamma", "en", None),     # NULL source
]


def _append(tbl: pa.Table, rows: dict) -> pa.Table:
    extra = pa.table(
        {name: pa.array(rows[name], type=tbl.schema.field(name).type)
         for name in tbl.schema.names},
        schema=pa.schema([tbl.schema.field(n) for n in tbl.schema.names]),
    )
    return pa.concat_tables([tbl.select(tbl.schema.names), extra])


def _degenerate_events(tbl: pa.Table) -> pa.Table:
    """Seed the event-log edge cases a real ingest produces: anonymous
    events (NULL user_id), unclassified events (NULL event_type),
    NULL value, and the props-JSON garbage spectrum (NULL, empty
    string, invalid JSON, empty object).  One NULL-ts row is included
    deliberately: batch consumers must agree cross-engine on the NULL
    time bucket, and event-time STREAMING consumers must agree with
    their batch oracles on dropping it (Spark's window operator cannot
    bucket a NULL event time).
    """
    import datetime

    ids = tbl.column("event_id").to_pylist()
    base = max(ids) + 1
    t0 = datetime.datetime(2024, 1, 2, 3, 4, 5)
    rows = [
        # (ts, user_id, event_type, value, props)
        (t0, None, "click", 1.5, '{"k": 1}'),
        (t0, 7, None, 2.5, '{"k": 2}'),
        (t0, 7, "click", None, '{"k": 3}'),
        (t0, 7, "click", 3.5, None),
        (t0, 7, "click", 4.5, ""),
        (t0, 7, "click", 5.5, "not json"),
        (t0, 7, "click", 6.5, "{}"),
        (None, 7, "click", 7.5, '{"k": 4}'),
        (t0, None, None, None, None),
    ]
    return _append(tbl, {
        "event_id": [base + i for i in range(len(rows))],
        "ts": [r[0] for r in rows],
        "user_id": [r[1] for r in rows],
        "event_type": [r[2] for r in rows],
        "value": [r[3] for r in rows],
        "props": [r[4] for r in rows],
    })


def _degenerate_documents(tbl: pa.Table) -> pa.Table:
    base = max(tbl.column("doc_id").to_pylist()) + 1
    return _append(tbl, {
        "doc_id": [base + i for i in range(len(DEGENERATE_DOCS))],
        "text": [x[0] for x in DEGENERATE_DOCS],
        "lang": [x[1] for x in DEGENERATE_DOCS],
        "source": [x[2] for x in DEGENERATE_DOCS],
        "n_chars": [len(x[0]) if x[0] is not None else 0
                    for x in DEGENERATE_DOCS],
    })


def _degenerate_embeddings(tbl: pa.Table) -> pa.Table:
    """Seed the embedding edge cases a real encode pipeline produces:
    a NULL vector (failed encode), an all-zero vector (all-masked input
    — norm 0, so cosine against it is 0/0), and a NULL label.  A
    dim-mismatched or empty vector is OUT of contract: the corpus
    invariant is fixed-dim, which every index/quantizer assumes.
    """
    dim = len(next(v for v in tbl.column("embedding").to_pylist()
                   if v is not None))
    base = max(tbl.column("vec_id").to_pylist()) + 1
    unit = [0.0] * dim
    unit[0] = 1.0
    return _append(tbl, {
        "vec_id": [base, base + 1, base + 2],
        "embedding": [None, [0.0] * dim, unit],
        "label": [0, 0, None],
    })


def build(src: str, out: str) -> None:
    os.makedirs(out, exist_ok=True)
    made = {"documents": _degenerate_documents,
            "embeddings": _degenerate_embeddings,
            "events": _degenerate_events}
    n_extra = {}
    for t in TABLES:
        s, d = f"{src}/{t}.parquet", f"{out}/{t}.parquet"
        if t not in made:
            shutil.copyfile(s, d)
            continue
        tbl = pq.read_table(s)
        out_tbl = made[t](tbl)
        n_extra[t] = out_tbl.num_rows - tbl.num_rows
        pq.write_table(out_tbl, d)
    print(f"degenerate corpus at {out} "
          + " ".join(f"(+{n} {t} rows)" for t, n in n_extra.items()))


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out = sys.argv[2] if len(sys.argv) > 2 else ".bench_sf/degen"
    build(src, out)
