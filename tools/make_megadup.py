#!/usr/bin/env python3
"""Plant a MEGA-duplICATE cluster into a fixture dir: the adversarial
input the cc stars+minlinks edge generation was built for.

Usage: python3 tools/make_megadup.py <src_dir> <out_dir> <n_copies> [n_clusters]

Appends <n_copies> rows to documents.parquet, each copying doc 0's
text verbatim under a fresh id (2_000_000_000 + 10*i + 1 — never
%10==0, so withDupes adds no echo copies and the cluster size is
exactly n_copies + |docs with doc 0's text in the base corpus|).

With [n_clusters] > 1: plants <n_copies> copies of EACH of the first
<n_clusters> base docs — MANY medium clusters instead of one mega
cluster. That is the adversarial input for the PAIR-graph consumers
(q18_pagerank: bounded blocks, but Σ C(|B|,2) edges can cross the
2M local gate), where a single verbatim mega cluster would be
quadratic by construction.
Every copy shares all four minhash band buckets with doc 0, so the
stars+minlinks generator emits ~4*(n+1) LINEAR edges (the pre-r11
pair generator would have emitted ~4*n²/2 — the quadratic blowup this
fixture exists to measure), and with n large enough the symmetrized
edge set crosses the 2M default local-finish gate
(spark.graft.cc.localFinishEdges): the distributed star-contraction
loop MUST run real rounds before the shrunken graph hands off to the
one-task union-find.

All other tables are copied as-is (cc only reads documents).
"""
import os
import shutil
import sys

import pyarrow as pa
import pyarrow.parquet as pq


def main() -> None:
    src, out, n = sys.argv[1], sys.argv[2], int(sys.argv[3])
    k = int(sys.argv[4]) if len(sys.argv) > 4 else 1
    os.makedirs(out, exist_ok=True)
    for f in os.listdir(src):
        if f.endswith(".parquet") and f != "documents.parquet":
            shutil.copy(os.path.join(src, f), os.path.join(out, f))
    docs = pq.read_table(os.path.join(src, "documents.parquet"))
    rows = {c: docs.column(c).to_pylist()[:k] for c in docs.column_names}
    total = n * k
    ids = pa.array([2_000_000_000 + 10 * i + 1 for i in range(total)],
                   type=docs.schema.field("doc_id").type)
    cols = []
    for c in docs.column_names:
        if c == "doc_id":
            cols.append(ids)
        else:
            # cluster j's copies all replicate base doc j's value
            vals = [rows[c][i // n] for i in range(total)]
            cols.append(pa.array(vals, type=docs.schema.field(c).type))
    plant = pa.table(cols, schema=pa.schema(
        [docs.schema.field(c) for c in docs.column_names]))
    merged = pa.concat_tables([docs, plant])
    pq.write_table(merged, os.path.join(out, "documents.parquet"),
                   version="2.6")
    print(f"planted {n} copies x {k} cluster(s) "
          f"-> {merged.num_rows} docs in {out}")


if __name__ == "__main__":
    main()
