"""Scale-up generator for the scaling bench: replicate the sf0.1 tables
K times (default 10 -> sf1) with key remapping, so per-query wall-clock
slopes sf0.1 -> sf1 can be MEASURED instead of argued from plans.

Replication rules (replica r = 0 is the original data, untouched):
  * every synthetic key column shifts by r * (max_key + 1), with foreign
    keys shifted by the SAME modulus as their parent so join fan-out per
    key stays constant while key cardinality grows linearly — the way a
    real corpus grows;
  * documents gain a per-replica suffix token (" rtagN") so replicas are
    NOT exact/near duplicates of each other (otherwise every doc acquires
    9 cross-replica twins and the dedup family measures a distribution
    shift, not a scale-up); n_chars is recomputed for shifted rows;
  * embeddings cyclic-shift their dims by r so replica directions are
    uncorrelated (adding noise would keep them inside the same LSH bucket
    and quadratically inflate candidate pairs); norms are preserved;
  * events shift user_id so the per-user event count (session length,
    window sizes) stays constant while the user population grows;
  * dimension tables that do not scale in TPC-H (region, nation) are
    copied as-is.

Usage: python tools/make_sf.py [K] [OUT_DIR]   (defaults: 10, .bench_sf/sf1)
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"


def _shift(col: pa.ChunkedArray, r: int, mod: int) -> pa.Array:
    return pa.array(col.to_numpy(zero_copy_only=False) + r * mod, type=col.type)


def _replicate(name: str, out_dir: str, k: int, key_mods: dict[str, int],
               transform=None) -> None:
    t = pq.read_table(os.path.join(SRC, f"{name}.parquet"))
    parts = []
    for r in range(k):
        cols = {}
        for field in t.schema:
            c = t.column(field.name)
            if field.name in key_mods and r > 0:
                cols[field.name] = _shift(c, r, key_mods[field.name])
            else:
                cols[field.name] = c.combine_chunks()
        if transform is not None and r > 0:
            cols = transform(cols, r)
        parts.append(pa.table(cols, schema=t.schema))
    pq.write_table(pa.concat_tables(parts), os.path.join(out_dir, f"{name}.parquet"))


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out_dir = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".bench_sf", "sf1"
    )
    os.makedirs(out_dir, exist_ok=True)

    def mod(name: str, col: str) -> int:
        t = pq.read_table(os.path.join(SRC, f"{name}.parquet"), columns=[col])
        return int(t.column(col).to_numpy(zero_copy_only=False).max()) + 1

    doc_mod = mod("documents", "doc_id")
    vec_mod = mod("embeddings", "vec_id")
    ev_mod = mod("events", "event_id")
    user_mod = mod("events", "user_id")
    ok_mod = mod("orders", "o_orderkey")
    pk_mod = mod("part", "p_partkey")
    sk_mod = mod("supplier", "s_suppkey")
    ck_mod = mod("customer", "c_custkey")

    def doc_tf(cols, r):
        text = cols["text"].to_pylist()
        text = [None if s is None else f"{s} rtag{r}" for s in text]
        cols["text"] = pa.array(text, type=pa.string())
        cols["n_chars"] = pa.array(
            [None if s is None else len(s) for s in text], type=pa.int64()
        )
        return cols

    def emb_tf(cols, r):
        flat = cols["embedding"].flatten().to_numpy(zero_copy_only=False)
        offsets = cols["embedding"].offsets.to_numpy(zero_copy_only=False)
        widths = np.diff(offsets)
        out = np.empty_like(flat)
        pos = 0
        for w in widths:
            s = r % w if w else 0
            out[pos:pos + w] = np.roll(flat[pos:pos + w], s)
            pos += w
        cols["embedding"] = pa.ListArray.from_arrays(
            pa.array(offsets, type=pa.int32()), pa.array(out, type=pa.float32())
        )
        return cols

    _replicate("documents", out_dir, k, {"doc_id": doc_mod}, doc_tf)
    _replicate("embeddings", out_dir, k, {"vec_id": vec_mod}, emb_tf)
    _replicate("events", out_dir, k, {"event_id": ev_mod, "user_id": user_mod})
    _replicate("lineitem", out_dir, k,
               {"l_orderkey": ok_mod, "l_partkey": pk_mod, "l_suppkey": sk_mod})
    _replicate("orders", out_dir, k, {"o_orderkey": ok_mod, "o_custkey": ck_mod})
    _replicate("part", out_dir, k, {"p_partkey": pk_mod})
    _replicate("customer", out_dir, k, {"c_custkey": ck_mod})
    _replicate("supplier", out_dir, k, {"s_suppkey": sk_mod})
    _replicate("nation", out_dir, 1, {})
    _replicate("region", out_dir, 1, {})
    for name in ("documents", "embeddings", "events", "lineitem"):
        n = pq.ParquetFile(os.path.join(out_dir, f"{name}.parquet")).metadata.num_rows
        print(f"{name}: {n} rows")
    print(f"wrote sf{k / 10:g} tables to {out_dir}")


if __name__ == "__main__":
    main()
