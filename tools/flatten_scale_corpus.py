#!/usr/bin/env python3
"""Turn a ScaleSmoke-synthesized corpus (Spark directory-parquet) into a
Verify/check_oracle-compatible sf dir: each dir-table rewritten as ONE
parquet file, and the TPC-H tables the scale queries never touch
symlinked from the base sf dir so Tables.validate and the DuckDB views
resolve. Usage:
    python3 tools/flatten_scale_corpus.py <scaleWorkDir> <outDir> [baseSfDir]
"""
import os
import sys

import pyarrow as pa
import pyarrow.dataset as ds
import pyarrow.parquet as pq

work, out = sys.argv[1], sys.argv[2]
# abspath: a relative base would be stored verbatim in the symlink and
# resolve relative to the OUTPUT dir (dangling link, far-away failure)
base = os.path.abspath(sys.argv[3]) if len(sys.argv) > 3 else "/root/testdata/sf0.1"
os.makedirs(out, exist_ok=True)

for t in ["documents", "embeddings", "events"]:
    src = os.path.join(work, f"{t}.parquet")
    dst = os.path.join(out, f"{t}.parquet")
    table = ds.dataset(src, format="parquet").to_table()
    # preserve the physical schema the Spark writer produced (events.ts
    # stays the raw long the synthesizer wrote; Tables.events adapts).
    # row_group_size 65536: pyarrow's default writes ~1M-row groups, and
    # Spark can only split a parquet file at row-group boundaries — the
    # 1000x embeddings file came out as TWO 282 MB groups, capping every
    # engine-side decade replay at 2 of 32 cores. ~65k rows ≈ 20-65 MB
    # per group keeps the single-file layout (one file per table is the
    # flatten contract) while letting local[32] scan it wide.
    pq.write_table(table, dst, row_group_size=65536)
    print(f"  {t}: {table.num_rows} rows -> {dst}")

for t in ["region", "nation", "customer", "supplier", "part", "orders", "lineitem"]:
    dst = os.path.join(out, f"{t}.parquet")
    if not os.path.exists(dst):
        os.symlink(os.path.join(base, f"{t}.parquet"), dst)
print(f"flattened {work} -> {out} (base tables from {base})")
