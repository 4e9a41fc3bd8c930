#!/usr/bin/env python3
"""Synthesize larger scale factors from sf0.1 for the local scaling
study (SCALING.md): sfX = N disjoint copies of sf0.1 with shifted ids.

Usage: python3 tools/make_scale.py <src_sf_dir> <out_dir> <n_copies>
           [--time-axis] [--tables t1,t2]

--time-axis (round 16): grow the EVENT TIME AXIS with the tier instead
of packing every copy into the source's fixed ~30-day span — copy i's
events.ts shifts by i*31 days, so events-per-time-bin (and therefore
the OUTPUT of any time-window join, e.g. q20_range_join's 15-minute
activation windows) stays ~constant per tier instead of growing ∝ tier.
This is the production shape — history grows the axis with the data —
and it turns the r15 "range-join output grows ∝ tier², exponent 1.81"
adjudication into a measurement: the density-constant twin should land
~1.0. The default (packed) fixture stays the stress shape for
bin-density behavior. 31 days > every window/session/watermark width in
the suite, so copies can never join across the seam.

--tables: emit only the named tables (e.g. `--tables events` for a
range-join twin — the only table that query reads), skipping the
expensive documents/embeddings mutations.

Design rules (so the workload GROWS instead of degenerating):
- id columns shift by i*1e8 per copy (preserves doc_id % 10/20 and
  div-1000/8192 bucket semantics; stays clear of withDupes' +1e6).
- documents.text gets a per-copy word suffix (every word w -> w_i for
  copy i>0): copies are NOT near-duplicates of each other, so minhash/
  simhash/gram candidate pairs scale linearly with copies instead of
  quadratically (cross-copy identical text would put every replica in
  the same LSH bucket — a data artifact, not an engine behavior).
- embeddings rotate by 7*i dims per copy: same marginal distribution,
  no cross-copy cosine~1 pairs; vec_id<5 probes exist only in copy 0
  (fixed probe set over a growing corpus — the ANN scaling shape).
- embeddings labels shift by i*1000 per copy: cluster COUNT grows with
  the corpus while cluster SIZE stays constant — the production shape
  (K is the kmeans/IVF knob, retrained as n grows). The label-blocked
  pair generators (knn_graph, dedup_embed, semdedup) are |cluster|²
  by design; holding K fixed while data grew 10× measured 71× runtime
  on knn_graph (see SCALING.md) — the knob's warning label, not the
  default.
- events shift user_id by i*1e6 (stream count grows with data; per-
  stream history length stays constant, as it would in production).
- TPC-H dims (customer/supplier/part/nation/region) stay fixed; fact
  keys (l_orderkey/o_orderkey) shift. Dim-fixed fact growth is the
  standard warehouse scale path.
- events.ts keeps its TIMESTAMP(NANOS) physical type (Envelope.readTable
  depends on it), hence pyarrow with version=2.6 throughout.
"""
import sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SHIFT = 100_000_000
USER_SHIFT = 1_000_000

COPY_AS_IS = ["region", "nation", "customer", "supplier", "part"]
ID_SHIFTS = {
    "events": ["event_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "orders": ["o_orderkey"],
    "lineitem": ["l_orderkey"],
}


# --time-axis: per-copy events.ts shift. 31 days in the ts column's own
# unit — wider than any window/session/watermark in the suite, so no
# time-window operator can pair rows across the copy seam.
AXIS_DAYS = 31


def shifted_copy(tbl: pa.Table, name: str, i: int, time_axis: bool = False) -> pa.Table:
    if i == 0:
        return tbl
    for col in ID_SHIFTS.get(name, []):
        idx = tbl.schema.get_field_index(col)
        tbl = tbl.set_column(idx, col, pc.add(tbl.column(col), i * SHIFT))
    if name == "events":
        idx = tbl.schema.get_field_index("user_id")
        tbl = tbl.set_column(idx, "user_id",
                             pc.add(tbl.column("user_id"), i * USER_SHIFT))
        if time_axis:
            tidx = tbl.schema.get_field_index("ts")
            tcol = tbl.column("ts")
            ttype = tcol.type  # timestamp, unit varies by fixture generation
            per_day = {"s": 86_400, "ms": 86_400_000,
                       "us": 86_400_000_000, "ns": 86_400_000_000_000}[ttype.unit]
            shifted = pc.add(tcol.cast(pa.int64()), i * AXIS_DAYS * per_day)
            tbl = tbl.set_column(tidx, "ts", shifted.cast(ttype))
    if name == "documents":
        idx = tbl.schema.get_field_index("text")
        mutated = pc.replace_substring_regex(
            tbl.column("text"), pattern=r"(\S+)", replacement=rf"\1_{i}")
        tbl = tbl.set_column(idx, "text", mutated.cast(tbl.schema.field("text").type))
    if name == "embeddings":
        idx = tbl.schema.get_field_index("embedding")
        col = tbl.column("embedding").combine_chunks()
        mat = np.array(col.to_pylist(), dtype=np.float32)
        rolled = np.roll(mat, 7 * i, axis=1)
        arr = pa.array(list(rolled), type=tbl.schema.field("embedding").type)
        tbl = tbl.set_column(idx, "embedding", arr)
        lidx = tbl.schema.get_field_index("label")
        ltype = tbl.schema.field("label").type
        tbl = tbl.set_column(lidx, "label",
                             pc.add(tbl.column("label"), i * 1000).cast(ltype))
    return tbl


def main(src: str, out: str, n: int, time_axis: bool = False,
         tables: set | None = None) -> None:
    import os
    os.makedirs(out, exist_ok=True)
    for name in COPY_AS_IS:
        if tables and name not in tables:
            continue
        t = pq.read_table(f"{src}/{name}.parquet")
        pq.write_table(t, f"{out}/{name}.parquet", version="2.6")
        print(f"{name}: {t.num_rows} rows (dim, unscaled)")
    for name in ID_SHIFTS:
        if tables and name not in tables:
            continue
        t = pq.read_table(f"{src}/{name}.parquet")
        parts = [shifted_copy(t, name, i, time_axis) for i in range(n)]
        big = pa.concat_tables(parts)
        pq.write_table(big, f"{out}/{name}.parquet", version="2.6")
        print(f"{name}: {t.num_rows} -> {big.num_rows} rows"
              + (" (time axis grown)" if time_axis and name == "events" else ""))


if __name__ == "__main__":
    argv = sys.argv[1:]
    time_axis = "--time-axis" in argv
    tables = None
    if "--tables" in argv:
        tables = set(argv[argv.index("--tables") + 1].split(","))
        del argv[argv.index("--tables"):argv.index("--tables") + 2]
    argv = [a for a in argv if a != "--time-axis"]
    main(argv[0], argv[1], int(argv[2]), time_axis, tables)
