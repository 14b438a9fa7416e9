#!/usr/bin/env python3
"""Build the off-gate dup-heavy scale corpus for graft.ScaleSmoke.

Replicates each sf0.1 document into a 10-member near-dup family:
variant 0 is the original, variants 1-4 are exact copies, variants 5-9
drop one token at a deterministic position (3-gram Jaccard stays >= 0.5
for the ~100-token docs, so each family contributes C(10,2) = 45 true
near-dup pairs -> ~225k pairs over 50k docs). Deterministic: no RNG.

Usage: python3 tools/make_scale_corpus.py [src_dir] [out_dir]
  (defaults: /root/testdata/sf0.1 -> /tmp/sfbig)

Round-2 built this corpus ad hoc and lost the script; this file is the
reproducible home. Only `documents.parquet` is materialized — the dedup
family reads nothing else.
"""
import sys

import duckdb

src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sfbig"

import os
os.makedirs(out, exist_ok=True)

con = duckdb.connect()
con.sql(f"""
COPY (
  WITH base AS (SELECT doc_id, text, lang, source
                FROM '{src}/documents.parquet'),
  v AS (SELECT * FROM base, unnest(range(0, 10)) AS t(variant)),
  mut AS (
    SELECT doc_id * 100 + variant AS doc_id,
      CASE WHEN variant < 5 THEN text
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
print(f"wrote {out}/documents.parquet ({n} docs)")
