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
Only the tables the skew-sensitive paths read are generated:
documents.parquet (t10/t11/t14, d3/d10) and embeddings.parquet (s3/s4).

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
lang_vals, lang_counts = np.unique([l for _, l, _ in docs],
                                   return_counts=True)
n_docs = len(docs) * factor
out_lens = rng.choice(lens, n_docs)  # bootstrap the length distribution
out_langs = rng.choice(lang_vals, n_docs, p=lang_counts / lang_counts.sum())
out_src = [f"src{i}" for i in rng.integers(0, 20, n_docs)]
texts = []
for i in range(n_docs):
    if i > 100 and rng.random() < 0.05:
        # near-dup: perturb ~10% of an earlier doc's words in place
        words = texts[int(rng.integers(0, i))].split(" ")
        idx = rng.random(len(words)) < 0.10
        repl = rng.choice(vocab, int(idx.sum()))
        words = np.array(words, dtype=object)
        words[idx] = repl
        texts.append(" ".join(words))
    else:
        texts.append(" ".join(rng.choice(vocab, out_lens[i])))
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
