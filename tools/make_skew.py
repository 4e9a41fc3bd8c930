#!/usr/bin/env python3
"""Inject hot keys into a fixture dir: the skew twin of make_scale.py.

Usage: python3 tools/make_skew.py <src_dir> <out_dir>

Uniform replication (make_scale.py) grows data but keeps every key's
share constant; production 100 TB corpora don't behave — one crawl
source dominates, one power user floods the event stream, one order
carries a runaway basket. This transform plants exactly those hot keys
so the skew-sensitive plans (per-source prefix sums, per-user windows,
fact joins) can be measured against their uniform twins at the same
row count, and so the DuckDB oracle can pin correctness ON skewed
input (Spark and the oracle read the same files, so every green row is
a correctness-under-skew proof, not a fixture comparison):

- documents: every even doc_id moves to source 'src_hot' (~50% of the
  corpus in one source — the packing/overlap/mix hot group).
- events: every event_id % 5 == 0 moves to user_id 42 (~20% of the
  stream in one per-user window partition — the sessionize/funnel/
  retention hot key).
- lineitem: every l_orderkey % 10 == 0 moves to the smallest existing
  l_orderkey (~10% of the fact table on one join key — the AQE
  skew-join case).

Text, embeddings, ids, and all other tables are untouched: dedup/LSH
bucket populations keep their uniform-fixture shape, so any runtime
delta is attributable to the planted keys alone.
"""
import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

COPY_AS_IS = ["region", "nation", "customer", "supplier", "part",
              "orders", "embeddings"]


def skew_documents(tbl: pa.Table) -> pa.Table:
    hot = pc.equal(pc.bit_wise_and(tbl.column("doc_id"), 1), 0)
    idx = tbl.schema.get_field_index("source")
    stype = tbl.schema.field("source").type
    src = pc.if_else(hot, pa.scalar("src_hot", type=stype), tbl.column("source"))
    return tbl.set_column(idx, "source", src.cast(stype))


def _mod_mask(col: pa.ChunkedArray, m: int) -> pa.Array:
    import numpy as np
    vals = col.combine_chunks().to_numpy(zero_copy_only=False)
    return pa.array(np.asarray(vals) % m == 0)


def skew_events(tbl: pa.Table) -> pa.Table:
    hot = _mod_mask(tbl.column("event_id"), 5)
    idx = tbl.schema.get_field_index("user_id")
    utype = tbl.schema.field("user_id").type
    uid = pc.if_else(hot, pa.scalar(42, type=utype), tbl.column("user_id"))
    return tbl.set_column(idx, "user_id", uid.cast(utype))


def skew_lineitem(tbl: pa.Table) -> pa.Table:
    hot_key = pc.min(tbl.column("l_orderkey")).as_py()
    hot = _mod_mask(tbl.column("l_orderkey"), 10)
    idx = tbl.schema.get_field_index("l_orderkey")
    ktype = tbl.schema.field("l_orderkey").type
    key = pc.if_else(hot, pa.scalar(hot_key, type=ktype), tbl.column("l_orderkey"))
    return tbl.set_column(idx, "l_orderkey", key.cast(ktype))


TRANSFORMS = {
    "documents": skew_documents,
    "events": skew_events,
    "lineitem": skew_lineitem,
}


def skew_events_pct(tbl: pa.Table, pct: int) -> pa.Table:
    """Hot-fraction variant (round 17, SCALING.md hot-fraction curve):
    route `pct`% of events to user 42 — hot iff event_id % 20 < pct/5,
    so pct ∈ {5,10,…,95}. The default fixture's mod-5 rule picks a
    different id SET at 20% but the same fraction; the curve only
    compares across its own variants, so the rule change is benign."""
    assert pct % 5 == 0 and 0 < pct < 100, "pct must be a multiple of 5 in (0,100)"
    import numpy as np
    vals = tbl.column("event_id").combine_chunks().to_numpy(zero_copy_only=False)
    hot = pa.array(np.asarray(vals) % 20 < pct // 5)
    idx = tbl.schema.get_field_index("user_id")
    utype = tbl.schema.field("user_id").type
    uid = pc.if_else(hot, pa.scalar(42, type=utype), tbl.column("user_id"))
    return tbl.set_column(idx, "user_id", uid.cast(utype))


def main(src: str, out: str, events_hot_pct: int = 0) -> None:
    os.makedirs(out, exist_ok=True)
    if events_hot_pct:
        # events-only variant for the hot-fraction curve: every other
        # table is symlinked from the source fixture (the window family
        # under study reads events alone, and a 60x fixture set would
        # otherwise cost ~900 MB per curve point)
        for name in COPY_AS_IS + ["documents", "lineitem"]:
            dst = f"{out}/{name}.parquet"
            if not os.path.exists(dst):
                os.symlink(os.path.abspath(f"{src}/{name}.parquet"), dst)
        t = pq.read_table(f"{src}/events.parquet")
        pq.write_table(skew_events_pct(t, events_hot_pct),
                       f"{out}/events.parquet", version="2.6")
        print(f"events: {t.num_rows} rows ({events_hot_pct}% -> user 42; rest symlinked)")
        return
    for name in COPY_AS_IS:
        t = pq.read_table(f"{src}/{name}.parquet")
        pq.write_table(t, f"{out}/{name}.parquet", version="2.6")
        print(f"{name}: {t.num_rows} rows (copied)")
    for name, fn in TRANSFORMS.items():
        t = pq.read_table(f"{src}/{name}.parquet")
        skewed = fn(t)
        pq.write_table(skewed, f"{out}/{name}.parquet", version="2.6")
        print(f"{name}: {t.num_rows} rows (skewed)")


if __name__ == "__main__":
    pct = 0
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    for a in sys.argv[1:]:
        if a.startswith("--events-hot-pct="):
            pct = int(a.split("=", 1)[1])
        elif a.startswith("--"):
            # Strict: a typo'd flag (--events-hot-pct 20 with a space,
            # --events-hot-pc=20) must not silently fall through to
            # pct=0 and write the full mod-5 fixture under a hot-N
            # label — that is a mislabeled curve point with no error.
            sys.exit(f"make_skew.py: unknown flag {a!r} "
                     "(only --events-hot-pct=N is accepted)")
    if len(args) != 2:
        sys.exit("usage: make_skew.py SRC_DIR OUT_DIR [--events-hot-pct=N]")
    main(args[0], args[1], pct)
