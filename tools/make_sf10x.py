"""Derive a 10x-scaled dataset from /root/testdata/sf0.1 for the scale
proof pass (VERDICT round-5 item 6): replicate fact tables 10x with
consistently shifted surrogate keys (foreign keys shift with their parent
so join fan-outs stay realistic), keep the fixed dimension tables
(region/nation) at 1x. The oracle recomputes over the SAME derived files,
so Spark-vs-DuckDB comparisons remain exact.

Usage: python3 tools/make_sf10x.py [--salt-text] [outdir] [replicas] [tables...]
(defaults: /tmp/sfx10, 10, all tables — pass e.g. `100 documents events`
for the 100x spot-proof subset)

--salt-text interleaves a per-replica tag between every token of
documents.text (replica 0 unchanged). Without it, every doc has
(replicas-1) byte-identical copies, so the dedup queries' candidate-PAIR
work grows as replicas^2 — at 100x that is ~4950 pairs per original dup
group in BOTH engines, which measures the derivation artifact, not
scaling. A trailing tag is NOT enough: interior 3-gram shingles stay
identical across replicas, and a shingle unique at 1x has df exactly
`replicas` at Nx — under the df<=100 hot-shingle cap those survive at
100x and still connect all replica pairs. Interleaving the tag puts it
inside every shingle window, so replicas share no shingles at all: the
dup structure keeps its 1x density per replica, the scale-up is
work-linear, and the hash-compare stays exact (the oracle recomputes
over the same files).
"""
import sys, os, shutil
import pyarrow as pa
import pyarrow.parquet as pq
import pyarrow.compute as pc

args = [a for a in sys.argv[1:] if a not in ("--salt-text", "--perm-emb")
        and not a.startswith("--clustered")]
SALT = "--salt-text" in sys.argv[1:]
# --clustered[=SIGMA] REPLACES the embedding column of the whole derived
# table with a deterministic mixture of Gaussians: 64 latent centers (unit
# Gaussians over the original dim), each vector = its center + SIGMA*noise
# (default 0.35 -> within-cluster cosine ~1/(1+sigma^2) ~ 0.89, the
# clustered geometry real document/image embeddings have and IVF is
# designed for; cross-cluster cosine ~0). Use for the ANN recall
# measurement's clustered regime (the --perm-emb decorrelated derivation is
# its isotropic opposite); NOT for the oracle hash-compare pass. Seeded, so
# the derivation is reproducible byte-for-byte.
CLUSTER_SIGMA = None
for a in sys.argv[1:]:
    if a == "--clustered":
        CLUSTER_SIGMA = 0.35
    elif a.startswith("--clustered="):
        CLUSTER_SIGMA = float(a.split("=", 1)[1])
# --perm-emb applies a per-replica deterministic dimension permutation +
# sign flips to embeddings (replica 0 unchanged). The transform is
# orthogonal, so each replica is a geometrically EXACT copy of the original
# manifold (within-replica cosines identical), but cross-replica cosines
# become ~random — without it every vector has (replicas-1) byte-identical
# twins that fill each query's true top-5 and share its inverted list, so
# any ANN recall measured on the derivation reads 1.0 trivially (the
# embedding analog of the --salt-text dedup artifact). Use for the
# ANN_RECALL.md scale measurement; leave off for the oracle hash-compare
# pass (the oracle recomputes over the same files either way).
PERM = "--perm-emb" in sys.argv[1:]
SRC = "/root/testdata/sf0.1"
OUT = args[0] if len(args) > 0 else "/tmp/sfx10"
REPLICAS = int(args[1]) if len(args) > 1 else 10
ONLY = set(t + ".parquet" for t in args[2:]) or None

# per-table key columns shifted by replica * span(key-family); span is taken
# from the parent table's max so parent/child shift identically
FAMILIES = {
    "custkey": ("customer.parquet", "c_custkey"),
    "orderkey": ("orders.parquet", "o_orderkey"),
    "partkey": ("part.parquet", "p_partkey"),
    "suppkey": ("supplier.parquet", "s_suppkey"),
    "doc": ("documents.parquet", "doc_id"),
    "vec": ("embeddings.parquet", "vec_id"),
    "event": ("events.parquet", "event_id"),
    "user": ("events.parquet", "user_id"),
}
SHIFT_COLS = {
    "customer.parquet": {"c_custkey": "custkey"},
    "orders.parquet": {"o_orderkey": "orderkey", "o_custkey": "custkey"},
    "lineitem.parquet": {"l_orderkey": "orderkey", "l_partkey": "partkey", "l_suppkey": "suppkey"},
    "part.parquet": {"p_partkey": "partkey"},
    "supplier.parquet": {"s_suppkey": "suppkey"},
    "documents.parquet": {"doc_id": "doc"},
    "embeddings.parquet": {"vec_id": "vec"},
    "events.parquet": {"event_id": "event", "user_id": "user"},
}
FIXED = ["region.parquet", "nation.parquet"]

os.makedirs(OUT, exist_ok=True)
spans = {}
for fam, (tbl, col) in FAMILIES.items():
    t = pq.read_table(os.path.join(SRC, tbl), columns=[col])
    spans[fam] = int(pc.max(t.column(col)).as_py()) + 1

for tbl in FIXED:
    if ONLY and tbl not in ONLY:
        continue
    shutil.copyfile(os.path.join(SRC, tbl), os.path.join(OUT, tbl))
    print(tbl, "copied 1x")

for tbl, cols in SHIFT_COLS.items():
    if ONLY and tbl not in ONLY:
        continue
    src = pq.read_table(os.path.join(SRC, tbl))
    parts = []
    for r in range(REPLICAS):
        t = src
        if r > 0:
            for col, fam in cols.items():
                idx = t.schema.get_field_index(col)
                shifted = pc.add(t.column(col), r * spans[fam])
                # preserve the original dtype (add may upcast)
                shifted = pc.cast(shifted, src.schema.field(col).type)
                t = t.set_column(idx, src.schema.field(col), shifted)
            if PERM and tbl == "embeddings.parquet":
                import numpy as np
                ei = t.schema.get_field_index("embedding")
                emb = t.column("embedding").combine_chunks()
                n = len(emb)
                dim = len(emb[0])
                flat = np.asarray(emb.flatten(), dtype=np.float32).reshape(n, dim)
                rng = np.random.RandomState(1000 + r)
                permuted = (flat[:, rng.permutation(dim)] *
                            rng.choice([-1.0, 1.0], dim).astype(np.float32))
                arr = pa.ListArray.from_arrays(
                    pa.array(np.arange(0, (n + 1) * dim, dim, dtype=np.int32)),
                    pa.array(permuted.ravel()),
                )
                t = t.set_column(ei, src.schema.field("embedding"),
                                 arr.cast(src.schema.field("embedding").type))
            if SALT and tbl == "documents.parquet":
                ti = t.schema.get_field_index("text")
                salted = pc.replace_substring_regex(
                    t.column("text"), pattern=r"\s+", replacement=f" zr{r}z ")
                salted = pc.binary_join_element_wise(salted, pa.scalar(f"zr{r}z"), " ")
                t = t.set_column(ti, src.schema.field("text"), salted)
                ni = t.schema.get_field_index("n_chars")
                t = t.set_column(ni, src.schema.field("n_chars"),
                                 pc.cast(pc.utf8_length(t.column("text")), pa.int64()))
        parts.append(t)
    out = pa.concat_tables(parts)
    if CLUSTER_SIGMA is not None and tbl == "embeddings.parquet":
        import numpy as np
        ei = out.schema.get_field_index("embedding")
        n = out.num_rows
        dim = len(out.column("embedding")[0])
        k_lat = 64
        rng = np.random.RandomState(7)
        centers = rng.standard_normal((k_lat, dim)).astype(np.float32)
        assign = rng.randint(0, k_lat, size=n)
        vecs = (centers[assign] +
                CLUSTER_SIGMA * rng.standard_normal((n, dim)).astype(np.float32))
        arr = pa.ListArray.from_arrays(
            pa.array(np.arange(0, (n + 1) * dim, dim, dtype=np.int32)),
            pa.array(vecs.ravel().astype(np.float32)),
        )
        out = out.set_column(ei, src.schema.field("embedding"),
                             arr.cast(src.schema.field("embedding").type))
        print(f"embeddings: clustered mixture k={k_lat} sigma={CLUSTER_SIGMA}")
    pq.write_table(out, os.path.join(OUT, tbl))
    print(tbl, f"{src.num_rows} -> {out.num_rows}")
