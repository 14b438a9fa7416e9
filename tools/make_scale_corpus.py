#!/usr/bin/env python3
"""Build the off-gate dup-heavy scale corpus for graft.ScaleSmoke.

Replicates each sf0.1 document into a 10-member near-dup family:
variant 0 is the original, variants 1-4 are exact copies, variants 5-9
drop one token at a deterministic position (3-gram Jaccard stays >= 0.5
for the ~100-token docs, so each family contributes C(10,2) = 45 true
near-dup pairs -> ~225k pairs over 50k docs). Deterministic: no RNG.

Usage: python3 tools/make_scale_corpus.py [src_dir] [out_dir] [family] [--docs-only]
  (defaults: /root/testdata/sf0.1 -> /tmp/sfbig, family=10, all tables)

`family` scales BOTH the corpus size and the dup-cluster size: family=30
builds 30-member families (15 exact copies + 15 distinct drop-one-token
variants), the round-11 "push past 10x" smoke — 3x the cluster size and
3x the rows of the default corpus in one knob. --docs-only skips the
orders/lineitem/... replicas (the dedup smoke reads only documents).

Round-2 built this corpus ad hoc and lost the script; this file is the
reproducible home. Besides `documents.parquet` (the dedup family's
input), round 4 adds 10x key-remapped replicas of orders / lineitem /
embeddings so the iterative operators (q74 pagerank, q85 kmeans, q92)
smoke at the same off-gate scale: order keys are remapped consistently
on both sides of the orders-lineitem join, and customer/supplier keys
fan out so the pagerank graph grows in nodes, not just edge
multiplicity.
"""
import sys

import duckdb

args = [a for a in sys.argv[1:] if a != "--docs-only"]
docs_only = "--docs-only" in sys.argv[1:]
src = args[0] if len(args) > 0 else "/root/testdata/sf0.1"
out = args[1] if len(args) > 1 else "/tmp/sfbig"
family = int(args[2]) if len(args) > 2 else 10
half = family // 2
# doc_id * idmul + variant must keep ids collision-free across families
idmul = 100 if family <= 100 else 1000

import os
os.makedirs(out, exist_ok=True)

con = duckdb.connect()
con.sql(f"""
COPY (
  WITH base AS (SELECT doc_id, text, lang, source
                FROM '{src}/documents.parquet'),
  v AS (SELECT * FROM base, unnest(range(0, {family})) AS t(variant)),
  mut AS (
    SELECT doc_id * {idmul} + variant AS doc_id,
      CASE WHEN variant < {half} THEN text
           ELSE array_to_string(
             list_filter(string_split(text, ' '),
               (x, i) -> i != 1 + ((variant * 7 + CAST(doc_id % 13 AS INTEGER))
                                   % greatest(len(string_split(text, ' ')), 1))),
             ' ')
      END AS text,
      lang, source
    FROM v)
  SELECT doc_id, text, lang, source, length(text) AS n_chars FROM mut
) TO '{out}/documents.parquet' (FORMAT PARQUET)
""")
n = con.sql(f"SELECT count(*) FROM '{out}/documents.parquet'").fetchone()[0]
print(f"wrote {out}/documents.parquet ({n} docs, {family}-member families)")

if docs_only:
    sys.exit(0)

# 10x replicas for the iterative-operator smokes. Key remapping keeps the
# orders-lineitem equi-join consistent (same k*10+r on both sides) and
# grows the customer/supplier node space of the q74 graph 10x.
for name, sql in {
    "orders": """SELECT * REPLACE (o_orderkey * 10 + r AS o_orderkey,
                                    o_custkey * 10 + r AS o_custkey)
                 FROM '{src}/orders.parquet', unnest(range(0, 10)) AS t(r)""",
    "lineitem": """SELECT * REPLACE (l_orderkey * 10 + r AS l_orderkey,
                                      l_suppkey * 10 + r AS l_suppkey)
                   FROM '{src}/lineitem.parquet',
                        unnest(range(0, 10)) AS t(r)""",
    # block replication (vec_id + r*1e6), NOT interleaved (*10+r): the
    # k-means smoke seeds from the lowest vec_ids, and interleaving
    # would make all k seeds copies of ONE original vector
    "embeddings": """SELECT * REPLACE (vec_id + r * 1000000 AS vec_id)
                     FROM '{src}/embeddings.parquet',
                          unnest(range(0, 10)) AS t(r)""",
    # customer keys fan out in step with orders.o_custkey so the q141
    # shortest-path seeds (c_custkey % 100 = 0) stay joinable
    "customer": """SELECT * REPLACE (c_custkey * 10 + r AS c_custkey)
                   FROM '{src}/customer.parquet',
                        unnest(range(0, 10)) AS t(r)""",
    # part keys fan out but p_brand (the q139 blocking key) is kept, so
    # per-brand block population grows 10x — the stress the smoke wants
    "part": """SELECT * REPLACE (p_partkey * 10 + r AS p_partkey)
               FROM '{src}/part.parquet',
                    unnest(range(0, 10)) AS t(r)""",
    # events fan out in users (10x distinct user_ids) with event_ids kept
    # unique — grows the per-user window/as-of key space, not the events
    # per user, which is the dimension the q176/q31 shapes shard on
    "events": """SELECT * REPLACE (event_id * 10 + r AS event_id,
                                    user_id * 10 + r AS user_id)
                 FROM '{src}/events.parquet',
                      unnest(range(0, 10)) AS t(r)""",
}.items():
    con.sql(f"COPY ({sql.format(src=src)}) TO '{out}/{name}.parquet'"
            " (FORMAT PARQUET)")
    n = con.sql(f"SELECT count(*) FROM '{out}/{name}.parquet'").fetchone()[0]
    print(f"wrote {out}/{name}.parquet ({n} rows)")

# scale-invariant dims, copied verbatim (TPC-H dims grow sublinearly;
# the smoke queries that read them — q211's nation join — treat them as
# broadcast metadata at any SF)
for name in ["region", "nation", "supplier"]:
    con.sql(f"COPY (SELECT * FROM '{src}/{name}.parquet') TO "
            f"'{out}/{name}.parquet' (FORMAT PARQUET)")
    print(f"wrote {out}/{name}.parquet (verbatim)")
