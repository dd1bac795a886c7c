#!/usr/bin/env python3
"""Synthesize a ~Nx scale probe for the skew-sensitive query paths.

No sf1.0 exists in this environment, so this script bootstraps a larger
corpus from sf0.1's OBSERVED distributions (same vocabulary, same
document-length / lang / source marginals, same per-label embedding
cluster means+spreads) rather than replicating rows — verbatim clones
would flood the dedup paths with artificial exact-dup groups and turn
the LSH buckets quadratic in clone count, which is not what a 10x
corpus looks like. A planted 5% near-dup rate (perturbed copies of
earlier docs) keeps the dedup verify stage honestly loaded.

Usage: python3 scripts/gen_scale_probe.py [factor] [outdir]
Defaults: factor=10, outdir=/tmp/graft_scale10. Deterministic (seeded).

Generated at factor x: documents, embeddings (distribution bootstrap,
see above), and the fact tables events / orders / lineitem / customer
(row bootstrap with REWRITTEN key spaces — event_id/o_orderkey/
c_custkey become fresh dense ranges, user_id/o_custkey spread over a
factor-x key space, lineitem groups cloned per new order so the
lines-per-order distribution survives; non-key attribute tuples are
sampled jointly so their correlations survive). Dimension tables
region / nation / part / supplier copy verbatim — dims grow slower
than facts at real scale, and keeping them broadcast-sized is the
honest 10x shape. The whole 125-query surface can then run against
the probe dir, not only the document/embedding families.

Then: SPARK_GRAFT_SF_DIR=<outdir> SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_ONLY=t10_packing,t11_stratified,t14_domain_mix,\
d3_minhash_lsh,d10_substring_dedup,s3_ivf_assign,s4_ivf_probe \
  sbt -batch 'runMain graft.Bench'
"""
import os
import sys

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_scale10"
# 'heaps' mode: the default bootstrap reuses sf0.1's OBSERVED vocabulary,
# which is CONSTANT in the factor — exactly the degenerate case the dedup
# routers escape to dense bitset sweeps for, so the banded/prefix scale
# routes never run. A real corpus grows vocabulary with Heaps' law
# (V = K * N^beta), so this mode grows the WORD list until the distinct
# char-TRIGRAM count (the shingle vocabulary the routers gate on) reaches
# T(N) = 0.6 * N^0.7 for N total tokens at this factor, sampling words
# with Zipf(1.0) frequencies over (observed head + synthetic tail) ranks.
# Anchors: T(1x) ~ 3.6k (dense route, like the driver corpus),
# T(10x) ~ 18k and T(30x) ~ 39k (both past the 16384 bitset cap -> the
# banded/prefix routes a 100 TB corpus takes).
heaps = len(sys.argv) > 3 and sys.argv[3] == "heaps"
src = "/root/testdata/sf0.1"
rng = np.random.default_rng(4242)
os.makedirs(out, exist_ok=True)
con = duckdb.connect()

# ---- documents ----------------------------------------------------------
docs = con.execute(
    f"SELECT text, lang, source FROM '{src}/documents.parquet'"
).fetchall()
vocab = np.array(sorted({w for t, _, _ in docs for w in t.split(" ")}))
lens = np.array([len(t.split(" ")) for t, _, _ in docs])
zipf_p = None
if heaps:
    n_tokens = int(lens.sum()) * factor
    target_tri = int(0.6 * n_tokens ** 0.7)
    tris = {t[i:i + 3] for t, _, _ in docs for i in range(len(t) - 2)}
    alpha = np.array(list("abcdefghijklmnopqrstuvwxyz0123456789"))
    # Synthetic words can only mint trigrams inside the |alpha|^3 space;
    # past ~factor 30 the raw Heaps target EXCEEDS it (factor 100 asks
    # for ~320k vs 36^3 = 46656 reachable) and the loop below would
    # never terminate. Cap at 92% of the still-unminted space (the last
    # few percent are coupon-collector-slow) — a saturated vocabulary is
    # MORE adversarial for the banded/prefix routes (denser buckets),
    # not less.
    alpha_set = set(alpha.tolist())
    in_space = sum(1 for t in tris
                   if len(t) == 3 and all(c in alpha_set for c in t))
    cap_tri = len(tris) + int(0.92 * (len(alpha) ** 3 - in_space))
    if cap_tri < target_tri:
        print(f"heaps target {target_tri} saturates the "
              f"{len(alpha)}^3 trigram space; capping at {cap_tri}")
        target_tri = cap_tri
    synth = []
    while len(tris) < target_tri:
        w = "".join(rng.choice(alpha, 8))
        synth.append(w)
        tris.update(w[i:i + 3] for i in range(6))
    vocab = np.concatenate([vocab, np.array(synth)])
    ranks = np.arange(1, len(vocab) + 1, dtype=float)
    zipf_p = (1.0 / ranks) / (1.0 / ranks).sum()
    print(f"heaps mode: {len(synth)} synthetic words, "
          f"~{len(tris)} distinct trigrams (target {target_tri})")
lang_vals, lang_counts = np.unique([l for _, l, _ in docs],
                                   return_counts=True)
n_docs = len(docs) * factor
out_lens = rng.choice(lens, n_docs)  # bootstrap the length distribution
out_langs = rng.choice(lang_vals, n_docs, p=lang_counts / lang_counts.sum())
out_src = [f"src{i}" for i in rng.integers(0, 20, n_docs)]
# One inverse-CDF table for every zipf draw: rng.choice(..., p=...)
# recomputes an O(vocab) cumulative sum PER CALL, which made the
# per-document loop O(n_docs x vocab) - hours at factor 100. Inverse-CDF
# sampling against the precomputed table draws the same distribution in
# O(n log vocab).
if zipf_p is not None:
    _cdf = np.cumsum(zipf_p)
    _cdf[-1] = 1.0

    def draw_ids(n):
        return np.searchsorted(_cdf, rng.random(n),
                               side="right").astype(np.int64)
else:
    def draw_ids(n):
        return rng.integers(0, len(vocab), n)

def draw_words(n):
    return vocab[draw_ids(n)]

# dup/fresh decisions first, then ONE bulk draw for all fresh docs; the
# near-dup pass runs ascending so a dup's source (dup or fresh) is
# always final before it is read - same structure as the old per-doc
# loop, minus the per-call CDF cost
is_dup = np.zeros(n_docs, dtype=bool)
if n_docs > 101:
    is_dup[101:] = rng.random(n_docs - 101) < 0.05
fresh_total = int(out_lens[~is_dup].sum())
flat_ids = draw_ids(fresh_total)
texts = [None] * n_docs
pos = 0
for i in range(n_docs):
    if not is_dup[i]:
        ln = int(out_lens[i])
        texts[i] = " ".join(vocab[flat_ids[pos:pos + ln]])
        pos += ln
for i in range(n_docs):
    if is_dup[i]:
        # near-dup: perturb ~10% of an earlier doc's words in place
        words = np.array(texts[int(rng.integers(0, i))].split(" "),
                         dtype=object)
        idx = rng.random(len(words)) < 0.10
        words[idx] = draw_words(int(idx.sum()))
        texts[i] = " ".join(words)
pq.write_table(
    pa.table(
        {
            "doc_id": pa.array(range(n_docs), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(list(out_langs), pa.string()),
            "source": pa.array(out_src, pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    ),
    f"{out}/documents.parquet",
)

# ---- embeddings ---------------------------------------------------------
emb = con.execute(
    f"SELECT label, embedding FROM '{src}/embeddings.parquet'"
).fetchall()
by_label = {}
for l, v in emb:
    by_label.setdefault(l, []).append(v)
stats = {
    l: (np.mean(vs, axis=0), np.std(vs, axis=0))
    for l, vs in by_label.items()
}
lab_vals = np.array(sorted(by_label))
lab_p = np.array([len(by_label[l]) for l in lab_vals], dtype=float)
n_vecs = len(emb) * factor
out_labels = rng.choice(lab_vals, n_vecs, p=lab_p / lab_p.sum())
vecs = np.empty((n_vecs, len(emb[0][1])), dtype=np.float32)
for l in lab_vals:
    m = out_labels == l
    mu, sd = stats[l]
    vecs[m] = (mu + rng.standard_normal((int(m.sum()), len(mu))) * sd
               ).astype(np.float32)
pq.write_table(
    pa.table(
        {
            "vec_id": pa.array(range(n_vecs), pa.int64()),
            "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
            "label": pa.array([int(x) for x in out_labels], pa.int32()),
        }
    ),
    f"{out}/embeddings.parquet",
)
print(f"wrote {n_docs} documents, {n_vecs} embeddings to {out}")

# ---- events -------------------------------------------------------------
# Per-user rate stays constant while the user population scales by
# `factor` — the shape a 10x event stream actually has. Attribute
# tuples (event_type, value, props) are sampled jointly; timestamps
# bootstrap the observed 30-day distribution with sub-second jitter so
# ties stay as unlikely as in the source.
ev = con.execute(
    f"SELECT epoch_ns(ts), event_type, value, props, user_id "
    f"FROM '{src}/events.parquet'").fetchall()
n_users = 1 + max(r[4] for r in ev)
n_ev = len(ev) * factor
pick = rng.integers(0, len(ev), n_ev)
ts_pick = rng.integers(0, len(ev), n_ev)
ts_ns = (np.array([ev[i][0] for i in ts_pick], dtype=np.int64)
         + rng.integers(-500_000_000, 500_000_000, n_ev))
pq.write_table(pa.table({
    "event_id": pa.array(range(n_ev), pa.int64()),
    "ts": pa.array(ts_ns, pa.timestamp("ns")),
    "user_id": pa.array(rng.integers(0, n_users * factor, n_ev),
                        pa.int64()),
    "event_type": pa.array([ev[i][1] for i in pick], pa.string()),
    "value": pa.array([ev[i][2] for i in pick], pa.float64()),
    "props": pa.array([ev[i][3] for i in pick], pa.string()),
}), f"{out}/events.parquet")

# ---- customer / orders / lineitem ---------------------------------------
# Keys are rewritten to fresh dense ranges; every o_custkey references a
# generated customer and every lineitem group is a clone of one original
# order's group filed under its new o_orderkey, so join fan-out and the
# lines-per-order distribution both survive the scale-up.
cust = con.execute(
    f"SELECT c_name, c_nationkey, c_acctbal, c_mktsegment "
    f"FROM '{src}/customer.parquet'").fetchall()
n_cust = len(cust) * factor
cpick = rng.integers(0, len(cust), n_cust)
pq.write_table(pa.table({
    "c_custkey": pa.array(range(n_cust), pa.int64()),
    "c_name": pa.array([cust[i][0] for i in cpick], pa.string()),
    "c_nationkey": pa.array([cust[i][1] for i in cpick], pa.int32()),
    "c_acctbal": pa.array([cust[i][2] for i in cpick], pa.float64()),
    "c_mktsegment": pa.array([cust[i][3] for i in cpick], pa.string()),
}), f"{out}/customer.parquet")

orders = con.execute(
    f"SELECT o_orderkey, o_orderstatus, o_totalprice, "
    f"epoch_ms(o_orderdate), o_orderpriority "
    f"FROM '{src}/orders.parquet'").fetchall()
n_ord = len(orders) * factor
opick = rng.integers(0, len(orders), n_ord)
pq.write_table(pa.table({
    "o_orderkey": pa.array(range(n_ord), pa.int64()),
    "o_custkey": pa.array(rng.integers(0, n_cust, n_ord), pa.int64()),
    "o_orderstatus": pa.array([orders[i][1] for i in opick], pa.string()),
    "o_totalprice": pa.array([orders[i][2] for i in opick], pa.float64()),
    "o_orderdate": pa.array(
        np.array([orders[i][3] for i in opick], dtype=np.int64),
        pa.timestamp("ms")),
    "o_orderpriority": pa.array([orders[i][4] for i in opick],
                                pa.string()),
}), f"{out}/orders.parquet")

li = con.execute(
    f"SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity, "
    f"l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus, "
    f"epoch_ms(l_shipdate) FROM '{src}/lineitem.parquet' "
    f"ORDER BY l_orderkey, l_linenumber").fetchall()
li_rows = {}
for r in li:
    li_rows.setdefault(r[0], []).append(r)
orig_keys = np.array(list(li_rows))
src_of_new = rng.choice(orig_keys, n_ord)  # orig order cloned per new key
cols = {name: [] for name in [
    "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
    "l_extendedprice", "l_discount", "l_tax", "l_returnflag",
    "l_linestatus", "l_shipdate"]}
for new_key, orig in enumerate(src_of_new):
    for r in li_rows[orig]:
        cols["l_orderkey"].append(new_key)
        for c, v in zip(list(cols)[1:], r[1:]):
            cols[c].append(v)
pq.write_table(pa.table({
    "l_orderkey": pa.array(cols["l_orderkey"], pa.int64()),
    "l_partkey": pa.array(cols["l_partkey"], pa.int64()),
    "l_suppkey": pa.array(cols["l_suppkey"], pa.int64()),
    "l_linenumber": pa.array(cols["l_linenumber"], pa.int32()),
    "l_quantity": pa.array(cols["l_quantity"], pa.float64()),
    "l_extendedprice": pa.array(cols["l_extendedprice"], pa.float64()),
    "l_discount": pa.array(cols["l_discount"], pa.float64()),
    "l_tax": pa.array(cols["l_tax"], pa.float64()),
    "l_returnflag": pa.array(cols["l_returnflag"], pa.string()),
    "l_linestatus": pa.array(cols["l_linestatus"], pa.string()),
    "l_shipdate": pa.array(np.array(cols["l_shipdate"], dtype=np.int64),
                           pa.timestamp("ms")),
}), f"{out}/lineitem.parquet")

# ---- dimensions: verbatim ----------------------------------------------
import shutil
for t in ["region", "nation", "part", "supplier"]:
    shutil.copyfile(f"{src}/{t}.parquet", f"{out}/{t}.parquet")
print(f"wrote {n_ev} events, {n_cust} customers, {n_ord} orders, "
      f"{len(cols['l_orderkey'])} lineitems to {out}")
