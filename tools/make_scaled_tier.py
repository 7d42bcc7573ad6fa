"""Derive a larger benchmark tier from the driver-generated testdata
by deterministic replication with key shifting (default: sf1 =
10 x sf0.1) — the empirical half of SCALE.md's scaling claims.

The driver's tiers stop at sf0.1; scaling VALIDATION (does each
headline query scale ~linearly from sf0.1 to sf1, or does some plan
hide a super-linear stage?) needs a 10x tier. Replication rules keep
referential integrity and per-copy workload characteristics so a 10x
run measures the PLAN, not artifact effects:

- every copy i shifts each dense 0-based key by i * (its table's
  cardinality), and foreign keys shift by the SAME copy index, so
  joins land inside the copy and selectivity distributions are
  unchanged;
- region/nation stay fixed (dimension hierarchy, like TPC-H);
- documents get every token suffixed with the copy tag (copy 0
  unchanged): shingle/MinHash structure inside each copy is
  identical to the original, and copies share no shingles — without
  this, 10 verbatim text copies would form size-10 near-dup
  clusters and the candidate-pair count would grow quadratically BY
  CONSTRUCTION, mislabeling a linear plan as super-linear;
- events keep their timestamps (10x density in the same window —
  the realistic shape of a bigger deployment) and user ids shift
  with their copy's customers;
- embeddings replicate verbatim (fixed QUERY_IDS/centroids make the
  ANN workload linear in candidates; exact-duplicate vectors
  tie-break deterministically by id).

Output is derived data under /tmp (never under /root/testdata, which
is read-only): /tmp/dp2025_scaled/sf<x>. Usage:

    python tools/make_scaled_tier.py [factor]
    SPARK_GRAFT_SF_DIR=/tmp/dp2025_scaled/sf1 python bench.py
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
CARD = {
    "customer": 15000,
    "orders": 150000,
    "lineitem": 150000,  # shifted by ORDER cardinality (FK target)
    "part": 20000,
    "supplier": 1000,
    "events": 100000,
    "documents": 5000,
    "embeddings": 2000,
}


def make(factor: int = 10, out_root: str = "/tmp/dp2025_scaled") -> str:
    out = os.path.join(out_root, f"sf{factor / 10:g}")
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    copies = f"(SELECT unnest(range({factor})) AS i)"

    def t(name: str) -> str:
        return f"read_parquet('{SRC}/{name}.parquet')"

    def write(name: str, sql: str) -> None:
        dest = os.path.join(out, f"{name}.parquet")
        con.execute(f"COPY ({sql}) TO '{dest}' (FORMAT PARQUET)")
        print(name, con.sql(f"SELECT count(*) FROM '{dest}'").fetchone()[0])

    for name in ("region", "nation"):
        write(name, f"SELECT * FROM {t(name)}")
    write(
        "customer",
        f"SELECT c_custkey + i * {CARD['customer']} AS c_custkey,"
        " c_name, c_nationkey, c_acctbal, c_mktsegment"
        f" FROM {t('customer')}, {copies}",
    )
    write(
        "supplier",
        f"SELECT s_suppkey + i * {CARD['supplier']} AS s_suppkey,"
        " s_name, s_nationkey"
        f" FROM {t('supplier')}, {copies}",
    )
    write(
        "part",
        f"SELECT p_partkey + i * {CARD['part']} AS p_partkey,"
        " * EXCLUDE (p_partkey)"
        f" FROM {t('part')}, {copies}",
    )
    write(
        "orders",
        f"SELECT o_orderkey + i * {CARD['orders']} AS o_orderkey,"
        f" o_custkey + i * {CARD['customer']} AS o_custkey,"
        " * EXCLUDE (o_orderkey, o_custkey)"
        f" FROM {t('orders')}, {copies}",
    )
    write(
        "lineitem",
        f"SELECT l_orderkey + i * {CARD['lineitem']} AS l_orderkey,"
        f" l_partkey + i * {CARD['part']} AS l_partkey,"
        f" l_suppkey + i * {CARD['supplier']} AS l_suppkey,"
        " * EXCLUDE (l_orderkey, l_partkey, l_suppkey)"
        f" FROM {t('lineitem')}, {copies}",
    )
    write(
        "events",
        f"SELECT event_id + i * {CARD['events']} AS event_id, ts,"
        f" user_id + i * {CARD['customer']} AS user_id,"
        " event_type, value, props"
        f" FROM {t('events')}, {copies}",
    )
    write(
        "documents",
        f"SELECT doc_id + i * {CARD['documents']} AS doc_id,"
        " CASE WHEN i = 0 THEN text ELSE array_to_string("
        "   list_transform(list_filter(string_split(text, ' '),"
        "                              x -> x <> ''),"
        "                  x -> x || 'c' || CAST(i AS VARCHAR)), ' ')"
        " END AS text,"
        " lang, source, n_chars"
        f" FROM {t('documents')}, {copies}",
    )
    # Embeddings: copy 0 verbatim; every other copy gets a
    # deterministic per-copy ORTHOGONAL transform (dimension
    # permutation + sign flips). Orthogonal => every intra-copy
    # angle, norm, and near-dup pair is EXACTLY preserved, so each
    # copy's ANN/near-dup workload is identical to the original —
    # while inter-copy cosines decorrelate to ~0. This is the vector
    # analog of the token suffixing above: without it, 10 verbatim
    # copies make every vector an exact duplicate of 9 others and
    # every near-pair a 100-pair clique, so the near-dup OUTPUT
    # (q43 and everything built on it: q70/q107/q172) grows
    # quadratically BY CONSTRUCTION and a linear plan measures as
    # super-linear. (Found empirically: q43 pairs 262 -> 116,200 at
    # 10x, q172 wall 4.1 s -> 158 s, all artifact.)
    dim = con.sql(
        f"SELECT len(embedding) FROM {t('embeddings')} LIMIT 1"
    ).fetchone()[0]
    import random

    def rot_expr(i: int) -> str:
        rng = random.Random(1_000 + i)  # deterministic per copy
        perm = list(range(1, dim + 1))  # DuckDB lists are 1-based
        rng.shuffle(perm)
        terms = ", ".join(
            f"{'-' if rng.random() < 0.5 else ''}embedding[{p}]" for p in perm
        )
        return f"CAST([{terms}] AS FLOAT[])"

    emb_branches = " UNION ALL ".join(
        f"SELECT vec_id + {i} * {CARD['embeddings']} AS vec_id,"
        + (" embedding," if i == 0 else f" {rot_expr(i)} AS embedding,")
        + f" label FROM {t('embeddings')}"
        for i in range(factor)
    )
    write("embeddings", emb_branches)
    con.close()
    return out


if __name__ == "__main__":
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    print("wrote", make(factor))
