"""Deterministic MULT-x scale-up of the driver's sf0.1 tables -> BENCH/data/sf1.

Round-3 verdict item: bench at one SF can be warm-up/constant-dominated, so
the near-linear claims (prefix filter, rarest-probe, bucketed LSH) need a
second, LARGER point on the curve. The driver testdata tops out at sf0.1 and
is read-only; this script synthesizes a 10x corpus from it, deterministically
(no wall-clock, no unseeded RNG; "synthesise deterministically at small
scale" is the sanctioned path — no external data).

Scaling must preserve the DENSITY of duplicate structure, not just row
count: naively replicating documents 10x would make every copy an exact
near-dup of its 9 siblings — pair count would grow ~45x and the "is it
linear?" question would be unanswerable. Instead each copy c applies a
per-copy CHARACTER SUBSTITUTION CIPHER (a bijection on [a-z]): char-wise
bijections map k-shingle sets bijectively, so WITHIN-copy Jaccard/
containment/token overlap is preserved EXACTLY (every detector sees the
same per-copy pair structure), while CROSS-copy texts share almost no
shingles (different ciphers). Result: pairs, clusters, candidates, and
bucket sizes all scale exactly linearly in MULT — the right yardstick.

Embeddings get per-copy coordinate sign flips: norms and within-copy
cosines are exactly preserved, cross-copy vectors decorrelate. Relational
tables remap their primary keys per copy and keep foreign keys into the
UNSCALED dims (customer/nation/...) intact — per-key group sizes grow 10x,
which is exactly the stress the window/groupBy queries should see.

Usage: python BENCH/make_sfx.py [--mult 10] [--out BENCH/data/sf1]
Runtime: ~20s. Output: ~180 MB of parquet (gitignored; regenerate at will).
"""

from __future__ import annotations

import argparse
import os
import shutil

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
ALPHA = "abcdefghijklmnopqrstuvwxyz"


def _ciphers(mult: int, seed: int = 42) -> list[str]:
    """mult deterministic permutations of [a-z]; copy 0 is the identity so
    the original corpus embeds unchanged."""
    rng = np.random.default_rng(seed)
    out = [ALPHA]
    for _ in range(mult - 1):
        out.append("".join(np.array(list(ALPHA))[rng.permutation(26)]))
    return out


def scale_documents(out_dir: str, mult: int) -> None:
    t = pq.read_table(os.path.join(SRC, "documents.parquet"))
    ids = t.column("doc_id").to_numpy()
    texts = t.column("text").to_pylist()
    lang = t.column("lang").to_pylist()
    source = t.column("source").to_pylist()
    parts = []
    for c, cipher in enumerate(_ciphers(mult)):
        tr = str.maketrans(ALPHA + ALPHA.upper(), cipher + cipher.upper())
        ct = [s.translate(tr) for s in texts]
        parts.append(
            pa.table(
                {
                    "doc_id": pa.array(ids + c * 10_000_000, pa.int64()),
                    "text": pa.array(ct, pa.string()),
                    "lang": pa.array(lang, pa.string()),
                    "source": pa.array(source, pa.string()),
                    "n_chars": pa.array([len(s) for s in ct], pa.int64()),
                }
            )
        )
    pq.write_table(pa.concat_tables(parts), os.path.join(out_dir, "documents.parquet"))


def scale_embeddings(out_dir: str, mult: int) -> None:
    t = pq.read_table(os.path.join(SRC, "embeddings.parquet"))
    ids = t.column("vec_id").to_numpy()
    emb = np.array(t.column("embedding").to_pylist(), dtype=np.float32)
    label = t.column("label").to_numpy()
    rng = np.random.default_rng(7)
    parts = []
    for c in range(mult):
        signs = np.ones(emb.shape[1], np.float32) if c == 0 else rng.choice(
            np.array([1.0, -1.0], np.float32), emb.shape[1]
        )
        parts.append(
            pa.table(
                {
                    "vec_id": pa.array(ids + c * 10_000_000, pa.int64()),
                    "embedding": pa.array((emb * signs).tolist(), pa.list_(pa.float32())),
                    "label": pa.array(label, pa.int32()),
                }
            )
        )
    pq.write_table(pa.concat_tables(parts), os.path.join(out_dir, "embeddings.parquet"))


def scale_relational(out_dir: str, mult: int) -> None:
    con = duckdb.connect()
    rng = f"(SELECT unnest(range({mult})) AS c)"
    con.sql(
        f"""COPY (
        SELECT o_orderkey + c*10000000 AS o_orderkey, o_custkey, o_orderstatus,
               o_totalprice, o_orderdate, o_orderpriority
        FROM read_parquet('{SRC}/orders.parquet') CROSS JOIN {rng}
    ) TO '{out_dir}/orders.parquet' (FORMAT PARQUET)"""
    )
    con.sql(
        f"""COPY (
        SELECT l_orderkey + c*10000000 AS l_orderkey, l_partkey, l_suppkey,
               l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
               l_returnflag, l_linestatus, l_shipdate
        FROM read_parquet('{SRC}/lineitem.parquet') CROSS JOIN {rng}
    ) TO '{out_dir}/lineitem.parquet' (FORMAT PARQUET)"""
    )
    con.sql(
        f"""COPY (
        SELECT event_id + c*10000000 AS event_id,
               ts + to_seconds(c * 7) AS ts,
               user_id, event_type, value, props
        FROM read_parquet('{SRC}/events.parquet') CROSS JOIN {rng}
    ) TO '{out_dir}/events.parquet' (FORMAT PARQUET)"""
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mult", type=int, default=10)
    ap.add_argument("--out", default=os.path.join(os.path.dirname(__file__), "data", "sf1"))
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    scale_documents(args.out, args.mult)
    scale_embeddings(args.out, args.mult)
    scale_relational(args.out, args.mult)
    for dim in ("region", "nation", "customer", "supplier", "part"):
        shutil.copyfile(
            os.path.join(SRC, f"{dim}.parquet"), os.path.join(args.out, f"{dim}.parquet")
        )
    total = sum(
        os.path.getsize(os.path.join(args.out, f)) for f in os.listdir(args.out)
    )
    print(f"wrote {args.out}: {total / 1e6:.0f} MB, mult={args.mult}")


if __name__ == "__main__":
    main()
