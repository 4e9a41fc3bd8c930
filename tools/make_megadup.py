#!/usr/bin/env python3
"""Plant a MEGA-duplICATE cluster into a fixture dir: the adversarial
input the cc stars+minlinks edge generation was built for.

Usage: python3 tools/make_megadup.py <src_dir> <out_dir> <n_copies>

Appends <n_copies> rows to documents.parquet, each copying doc 0's
text verbatim under a fresh id (2_000_000_000 + 10*i + 1 — never
%10==0, so withDupes adds no echo copies and the cluster size is
exactly n_copies + |docs with doc 0's text in the base corpus|).
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
    os.makedirs(out, exist_ok=True)
    for f in os.listdir(src):
        if f.endswith(".parquet") and f != "documents.parquet":
            shutil.copy(os.path.join(src, f), os.path.join(out, f))
    docs = pq.read_table(os.path.join(src, "documents.parquet"))
    row0 = {c: docs.column(c)[0].as_py() for c in docs.column_names}
    ids = pa.array([2_000_000_000 + 10 * i + 1 for i in range(n)],
                   type=docs.schema.field("doc_id").type)
    cols = []
    for c in docs.column_names:
        if c == "doc_id":
            cols.append(ids)
        else:
            cols.append(pa.array([row0[c]] * n,
                                 type=docs.schema.field(c).type))
    plant = pa.table(cols, schema=pa.schema(
        [docs.schema.field(c) for c in docs.column_names]))
    merged = pa.concat_tables([docs, plant])
    pq.write_table(merged, os.path.join(out, "documents.parquet"),
                   version="2.6")
    print(f"planted {n} copies of doc 0 ({len(row0['text'].split())} words) "
          f"-> {merged.num_rows} docs in {out}")


if __name__ == "__main__":
    main()
