#!/usr/bin/env python
"""Generate an sfN-equivalent dataset by key-shifted replication of sf0.1.

The driver ships sf{0.001,0.01,0.1}; VERDICT r3 #5 asks for a one-shot scale
smoke at ~sf1 (10x sf0.1) to validate that the heavy dedup/ANN/events tier
scales linearly.  This tool materializes that dataset OUTSIDE the graded
testdata tree (default /tmp/spark_graft_scale/sf1) by replicating sf0.1 K
times with disjoint key ranges:

- documents:  doc_id shifted per copy; a per-copy marker token interleaved
  after every 3rd word.  An appended-suffix variant was measured first and
  REJECTED: replicas were mutual near-dups, so true-pair counts grew ~1000x
  (quadratic in the copy group) and the pair queries' wall time — linear in
  OUTPUT pairs — read as fake super-linearity.  Interleaving every 3 words
  breaks ~2/3 of 3-gram shingles, putting cross-copy Jaccard well under the
  0.5 pair threshold, so the corpus-wide dup RATE stays constant under
  scaling — how a real corpus grows.
- embeddings: vec_id shifted; copies > 0 get a per-copy ORTHOGONAL transform
  (cyclic coordinate shift by 7*copy + deterministic sign flips).  Orthogonal
  => intra-copy pairwise cosines are preserved EXACTLY (the original pair
  structure replicates), while cross-copy cosines decorrelate to ~N(0, 1/dim),
  far below the 0.35 near-dup threshold.
- events:     event_id/user_id shifted per copy — per-user event counts (the
  sessionize/funnel/cohort working set) stay CONSTANT while user cardinality
  grows 10x, which is exactly how real event data scales.
- lineitem/orders/customer: orderkey/custkey shifted per copy (joins stay
  consistent).
- part/supplier: partkey/suppkey shifted per copy, with lineitem's
  l_partkey/l_suppkey shifted identically so each copy joins its own dim
  replicas (constant fanout).  Names are kept verbatim — the fuzzy-match
  entity key (p_name || '#' || p_partkey) already distinguishes copies,
  and flat name-prefix cardinality under 10x entities is the honest
  blocking-degradation regime to measure.  nation/region stay fixed-size.

Usage: python tools/make_scale.py [K] [OUT_DIR] [tables_csv]
       tables_csv (optional): scale only these tables (e.g.
       "documents,embeddings,events" for the sf10 ladder point); the rest are
       copied unscaled so every load_table still resolves.
"""

from __future__ import annotations

import os
import shutil
import sys

import duckdb

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/spark_graft_scale/sf1"
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count() or 8}")

    def rp(t: str) -> str:
        return f"read_parquet('{SRC}/{t}.parquet')"

    def write(t: str, sql: str) -> None:
        if only is not None and t not in only:
            shutil.copyfile(f"{SRC}/{t}.parquet", f"{out}/{t}.parquet")
            print(f"{t}: copied (not in table subset)")
            return
        con.execute(f"COPY ({sql}) TO '{out}/{t}.parquet' (FORMAT PARQUET)")
        n = con.execute(f"SELECT count(*) FROM read_parquet('{out}/{t}.parquet')").fetchone()[0]
        print(f"{t}: {n} rows")

    copies = f"(SELECT unnest(range({k})) AS copy)"

    write(
        "documents",
        f"""SELECT d.doc_id + c.copy * 1000000 AS doc_id,
                   CASE WHEN c.copy = 0 THEN d.text
                        ELSE regexp_replace(d.text, '((\\S+\\s+){{3}})',
                             '\\1k' || CAST(c.copy AS VARCHAR) || ' ', 'g') END AS text,
                   d.lang, d.source,
                   CAST(length(CASE WHEN c.copy = 0 THEN d.text
                        ELSE regexp_replace(d.text, '((\\S+\\s+){{3}})',
                             '\\1k' || CAST(c.copy AS VARCHAR) || ' ', 'g') END) AS BIGINT) AS n_chars
            FROM {rp('documents')} d CROSS JOIN {copies} c""",
    )
    write(
        "embeddings",
        f"""SELECT e.vec_id + c.copy * 1000000 AS vec_id,
                   CASE WHEN c.copy = 0 THEN e.embedding ELSE
                     list_transform(range(0, array_length(e.embedding)), i -> CAST(
                       e.embedding[((i + 7 * c.copy) % array_length(e.embedding)) + 1]
                       * (CASE WHEN (i * 2654435761 + c.copy * 40503) % 2 = 0
                               THEN 1 ELSE -1 END) AS FLOAT))
                   END AS embedding,
                   e.label
            FROM {rp('embeddings')} e CROSS JOIN {copies} c""",
    )
    write(
        "events",
        f"""SELECT e.event_id + c.copy * 100000000 AS event_id, e.ts,
                   e.user_id + c.copy * 100000000 AS user_id,
                   e.event_type, e.value, e.props
            FROM {rp('events')} e CROSS JOIN {copies} c""",
    )
    write(
        "lineitem",
        f"""SELECT l.* REPLACE (l.l_orderkey + c.copy * 100000000 AS l_orderkey,
                                l.l_partkey + c.copy * 10000000 AS l_partkey,
                                l.l_suppkey + c.copy * 10000000 AS l_suppkey)
            FROM {rp('lineitem')} l CROSS JOIN {copies} c""",
    )
    write(
        "orders",
        f"""SELECT o.* REPLACE (o.o_orderkey + c.copy * 100000000 AS o_orderkey,
                                o.o_custkey + c.copy * 10000000 AS o_custkey)
            FROM {rp('orders')} o CROSS JOIN {copies} c""",
    )
    write(
        "customer",
        f"""SELECT cu.* REPLACE (cu.c_custkey + c.copy * 10000000 AS c_custkey)
            FROM {rp('customer')} cu CROSS JOIN {copies} c""",
    )
    # part/supplier replicate with the SAME per-copy shift the lineitem FKs
    # get, so join fanout stays constant (each copy joins its own dims).
    # p_name is kept verbatim: entity identity in the fuzzy query is
    # p_name || '#' || p_partkey, so shifted keys already make every copy a
    # distinct entity, while name-prefix cardinality stays flat — exactly the
    # blocking-degradation regime the ladder is meant to measure.
    write(
        "part",
        f"""SELECT p.* REPLACE (p.p_partkey + c.copy * 10000000 AS p_partkey)
            FROM {rp('part')} p CROSS JOIN {copies} c""",
    )
    write(
        "supplier",
        f"""SELECT s.* REPLACE (s.s_suppkey + c.copy * 10000000 AS s_suppkey)
            FROM {rp('supplier')} s CROSS JOIN {copies} c""",
    )
    for t in ("nation", "region"):
        shutil.copyfile(f"{SRC}/{t}.parquet", f"{out}/{t}.parquet")
        print(f"{t}: copied (fixed-size dim)")
    con.close()
    print(f"done -> {out}")


if __name__ == "__main__":
    main()
