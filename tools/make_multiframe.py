#!/usr/bin/env python3
"""Multi-frame video fixture: pad documents.text so the derived GIF
assets carry nf >= 2 frames.

The multimodal convention derives every asset from the document text
(bytes = utf-8(text)), and the video frame count is nf = n_bytes//1024
+ 1. The driver fixtures' docs are almost all < 1 KiB, so every
fixture GIF is single-frame: cm == c0, the two-frame signature
collapses to the 64-cell first-frame space, and the documented
4096-cell two-frame bucket scaling claim of q18_video_dedup is never
exercised (SCALING.md r10 addendum 2 / round-12 watch item 1). This
tool plants nf in {2,3,4}: each text is padded with deterministic
filler words to a byte length in [1024*(1 + doc_id%3), ...), so
cm != c0 for every asset and the (nf, first+middle 2-bit cells)
bucket key uses its full space.

Padding is pure data mutation — every oracle derives from the parquet,
so the whole correctness surface stays checkable on the padded fixture.
Filler words come from a constant 64-word pool in a per-doc LCG order:
byte content (hence frame signatures) stays unique per doc, cross-doc
3-gram shingle collisions are ~64^-3 per window (near-dup structure
intact), and the corpus vocabulary grows by only 64 words. The first
cut used per-doc UNIQUE filler (mf{id}x{j}); that put ~1.5M distinct
words in the sf0.1 corpus and the BPE oracle's per-word recursive
merge CTE spilled >70 GB of DuckDB temp before filling the disk —
word-grain oracles cost O(|vocab|) per merge stage, so a fixture must
pad bytes without padding vocabulary.

Usage: python3 tools/make_multiframe.py <src_sf_dir> <out_dir>
"""
import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

OTHER = ["region", "nation", "customer", "supplier", "part", "orders",
         "lineitem", "events", "embeddings"]


POOL = [f"pad{i:02d}" for i in range(64)]  # 5-byte words, constant vocab


def pad_text(text: str, doc_id: int) -> str:
    # target byte length: 1 KiB * (1 + doc_id%3) + 1 → nf in {2,3,4}
    target = 1024 * (1 + doc_id % 3) + 1
    cur = len(text.encode("utf-8"))
    if cur >= target:
        return text
    filler = []
    state = (doc_id * 1000003 + 12345) & 0xFFFFFFFFFFFFFFFF
    while cur < target:
        state = (state * 6364136223846793005 + 1442695040888963407) \
            & 0xFFFFFFFFFFFFFFFF
        w = POOL[(state >> 33) & 63]
        filler.append(w)
        cur += len(w) + 1
    return text + " " + " ".join(filler)


def main(src: str, out: str) -> None:
    os.makedirs(out, exist_ok=True)
    t = pq.read_table(f"{src}/documents.parquet")
    ids = t.column("doc_id").to_pylist()
    texts = t.column("text").to_pylist()
    padded = [pad_text(x, i) for i, x in zip(ids, texts)]
    idx = t.schema.get_field_index("text")
    t = t.set_column(idx, "text",
                     pa.array(padded, type=t.schema.field("text").type))
    # n_chars rides along in some fixtures; keep it consistent if present
    if "n_chars" in t.schema.names:
        cidx = t.schema.get_field_index("n_chars")
        ctype = t.schema.field("n_chars").type
        t = t.set_column(cidx, "n_chars",
                         pa.array([len(x) for x in padded]).cast(ctype))
    pq.write_table(t, f"{out}/documents.parquet", version="2.6")
    nf = [len(x.encode("utf-8")) // 1024 + 1 for x in padded]
    print(f"documents: {t.num_rows} rows, nf distribution: "
          f"{ {k: nf.count(k) for k in sorted(set(nf))} }")
    for name in OTHER:
        p = f"{src}/{name}.parquet"
        q = f"{out}/{name}.parquet"
        if os.path.exists(p) and not os.path.exists(q):
            os.link(p, q)  # same filesystem: zero-copy
    print(f"-> {out}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
