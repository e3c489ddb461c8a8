#!/usr/bin/env python3
"""Driver-side fixture stretcher (NOT part of the engine): replicate an
sf dir K times with entity keys shifted by k*10^10, per BASELINE.md's
sf1 spot-check recipe — document text gets a per-copy suffix on EVERY
token (so copies are mutually dissimilar: zero shared shingles,
cross-copy edit distance >= 2) and embeddings get a per-copy
deterministic ORTHOGONAL transform (dimension permutation + sign
flips, seeded by the copy index): within-copy geometry is preserved
EXACTLY (every dot product / cosine unchanged), while cross-copy
cosines drop to the random-pair level — so dup/near-dup and
tau-neighbor structure grows LINEARLY for BOTH tables. Copy vec_ids
are mapped to k*10^10 + 2*id + 1 (odd), so NO copy row lands in the
vec_id % 50 = 0 eval split or the vec_id < 5 kNN query set: the eval/
query side stays the FIXED base set while the corpus grows — the
model a decontamination/kNN linearity claim is actually about. (The
r12 version replicated vectors verbatim: with the 10^10 id shift = 0
mod 50 the eval split grew 10x with exact-duplicate vectors and every
tau-pair multiplied ~100x — quadratic by fixture construction, not by
engine shape.) n_chars is recomputed from the rewritten text.

Usage: python3 scripts/stretch.py <src_sf_dir> <out_dir> <copies> [tables...]
Default tables: documents embeddings
"""
import random
import sys
import pyarrow as pa
import pyarrow.parquet as pq

SHIFT = 10_000_000_000


def stretch_documents(src, out, copies):
    t = pq.read_table(f"{src}/documents.parquet")
    d = t.to_pydict()
    ids, texts, langs, srcs = d["doc_id"], d["text"], d["lang"], d["source"]
    o_id, o_tx, o_lg, o_sc, o_nc = [], [], [], [], []
    for k in range(copies):
        for i in range(len(ids)):
            tx = texts[i] if k == 0 else \
                " ".join(w + f"x{k}" for w in texts[i].split(" "))
            o_id.append(ids[i] + k * SHIFT)
            o_tx.append(tx)
            o_lg.append(langs[i])
            o_sc.append(srcs[i])
            o_nc.append(len(tx))
    pq.write_table(pa.table({
        "doc_id": pa.array(o_id, pa.int64()), "text": o_tx, "lang": o_lg,
        "source": o_sc, "n_chars": pa.array(o_nc, pa.int64())}),
        f"{out}/documents.parquet")
    print(f"documents: {len(o_id)} rows")


def stretch_embeddings(src, out, copies):
    t = pq.read_table(f"{src}/embeddings.parquet")
    d = t.to_pydict()
    ids, emb, lab = d["vec_id"], d["embedding"], d["label"]
    dim = len(emb[0])
    # per-copy orthogonal transform: permute dimensions + flip signs
    # (copy 0 = identity). Orthogonal => within-copy cosines are exactly
    # the base fixture's; cross-copy cosines are pseudo-random.
    xforms = []
    for k in range(copies):
        rng = random.Random(1000 + k)
        perm = list(range(dim))
        if k > 0:
            rng.shuffle(perm)
        signs = [1.0] * dim if k == 0 else \
            [1.0 if rng.random() < 0.5 else -1.0 for _ in range(dim)]
        xforms.append((perm, signs))
    o_id, o_e, o_l = [], [], []
    for k in range(copies):
        perm, signs = xforms[k]
        for i in range(len(ids)):
            v = emb[i]
            o_id.append(ids[i] if k == 0 else k * SHIFT + 2 * ids[i] + 1)
            o_e.append(v if k == 0 else
                       [signs[j] * v[perm[j]] for j in range(dim)])
            o_l.append(lab[i])
    pq.write_table(pa.table({
        "vec_id": pa.array(o_id, pa.int64()),
        "embedding": pa.array(o_e, pa.list_(pa.float32())),
        "label": pa.array(o_l, pa.int64())}),
        f"{out}/embeddings.parquet")
    print(f"embeddings: {len(o_id)} rows")


def stretch_events(src, out, copies):
    """entity keys (event_id, user_id) shift by k*10^10; ts/type/value
    replicate verbatim — event streams legitimately repeat shapes, and
    every events consumer keys on ids/types/windows, not uniqueness of
    (ts, value) pairs"""
    t = pq.read_table(f"{src}/events.parquet")
    d = t.to_pydict()
    cols = {k: [] for k in d}
    for k in range(copies):
        for i in range(len(d["event_id"])):
            for c in d:
                v = d[c][i]
                if c in ("event_id", "user_id") and k > 0:
                    v = v + k * SHIFT
                cols[c].append(v)
    sch = t.schema
    pq.write_table(pa.table(
        {c: pa.array(cols[c], sch.field(c).type) for c in d}),
        f"{out}/events.parquet")
    print(f"events: {len(cols['event_id'])} rows")


def stretch_keyed(src, out, copies, table, key_cols, tag_col=None):
    """generic entity-key stretcher (customer, lineitem, ...): key
    columns shift by k*10^10, an optional text column gets the 2-char
    copy tag of the r11 recipe so copies are not byte-identical"""
    t = pq.read_table(f"{src}/{table}.parquet")
    d = t.to_pydict()
    cols = {k: [] for k in d}
    n = t.num_rows
    for k in range(copies):
        for i in range(n):
            for c in d:
                v = d[c][i]
                if c in key_cols and k > 0:
                    v = v + k * SHIFT
                if c == tag_col and k > 0:
                    v = f"{v}c{k}"
                cols[c].append(v)
    sch = t.schema
    pq.write_table(pa.table(
        {c: pa.array(cols[c], sch.field(c).type) for c in d}),
        f"{out}/{table}.parquet")
    print(f"{table}: {len(next(iter(cols.values())))} rows")


def main():
    src, out, copies = sys.argv[1], sys.argv[2], int(sys.argv[3])
    tables = sys.argv[4:] or ["documents", "embeddings"]
    import os
    os.makedirs(out, exist_ok=True)
    if "documents" in tables:
        stretch_documents(src, out, copies)
    if "embeddings" in tables:
        stretch_embeddings(src, out, copies)
    if "events" in tables:
        stretch_events(src, out, copies)
    if "customer" in tables:
        stretch_keyed(src, out, copies, "customer",
                      {"c_custkey"}, tag_col="c_name")
    if "lineitem" in tables:
        stretch_keyed(src, out, copies, "lineitem", {"l_orderkey"})


if __name__ == "__main__":
    main()
