#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify output
against the DuckDB oracles and diff values. Usage:
    python3 tools/check_oracle.py <sfDir> <verifyOutDir> [reportJson]

With a third argument, also writes a CORRECTNESS_rN.json-shaped artifact
(per-query rows/schema/hash flags) so scale runs leave the same evidence
trail as the driver's gate.
"""
import json, sys, glob, os, time
import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]
report_path = sys.argv[3] if len(sys.argv) > 3 else None
report = {}
con = duckdb.connect()
# Bound DuckDB's memory and let it spill: the 100x-corpus LSH oracles
# (200k vectors x 8 tables of signature CTEs) OOM-killed the process at
# the default unlimited setting, losing the whole report. 48 GiB leaves
# the OS and the (stopped) JVM plenty on a 128 GiB host.
con.sql(f"SET memory_limit='{os.environ.get('DUCKDB_MEM', '48GB')}'")
con.sql("SET temp_directory='/tmp/duckdb_oracle_spill'")
# Fewer threads = much lower peak memory for the giant hash joins the
# 100x LSH/BM25 CTEs produce (DuckDB scales operator memory with
# pipeline parallelism) — the knob for oracles that outgrow even the
# spill budget at full width.
if os.environ.get("DUCKDB_THREADS"):
    con.sql(f"SET threads={int(os.environ['DUCKDB_THREADS'])}")
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

# GRAFT_IVF_PARTITIONS=<k>: replay the IVF-family oracles via k bounded
# per-vec_id-partition passes instead of one monolithic n x sqrt(n) pair
# materialization (~57 GB at 2 M vectors) — see tools/ivf_partition.py.
# Identical answer hashing; cross-validated against the monolithic path
# at sf0.1 and 10x. Non-IVF oracles are untouched.
rewriter = None
if int(os.environ.get("GRAFT_IVF_PARTITIONS", "0") or 0) > 0:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from ivf_partition import IvfPartitionRewriter
    rewriter = IvfPartitionRewriter(
        con, int(os.environ["GRAFT_IVF_PARTITIONS"]))

def flush_report():
    """Write the report after EVERY query: a mid-run OOM kill (observed
    on the 100x LSH oracles) must lose at most one query's evidence,
    not the whole artifact."""
    if report_path:
        with open(report_path, "w") as f:
            json.dump(report, f, indent=1, sort_keys=True)

oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
fails, passes, skips = [], 0, 0
for name in sorted(os.listdir(outdir)):
    path = os.path.join(outdir, name)
    if not os.path.isdir(path):
        continue
    files = glob.glob(f"{path}/*.parquet")
    got = con.sql(f"SELECT * FROM read_parquet({files!r})").df()
    if name not in oracle:
        skips += 1
        report[name] = {"rows_match": None, "schema_match": None,
                        "hash_match": None, "spark_rows": len(got),
                        "oracle_rows": None, "err": "no_oracle"}
        print(f"  [rows-only] {name}: {len(got)} rows", flush=True)
        flush_report()
        continue
    oracle_t0 = time.time()
    def record(rows=None, schema=None, value=None, erows=None, err=None):
        report[name] = {"rows_match": rows, "schema_match": schema,
                        "hash_match": value, "spark_rows": len(got),
                        "oracle_rows": erows, "err": err,
                        "oracle_s": round(time.time() - oracle_t0, 3)}
    try:
        sql = oracle[name] if rewriter is None else rewriter.rewrite(oracle[name])
        exp = con.sql(sql).df()
    except Exception as e:
        record(err=f"oracle SQL error: {e}")
        fails.append((name, f"oracle SQL error: {e}"))
        flush_report()
        continue
    gcols, ecols = sorted(got.columns), sorted(exp.columns)
    if gcols != ecols:
        record(schema=False, erows=len(exp))
        fails.append((name, f"columns differ: spark={gcols} duck={ecols}"))
        flush_report()
        continue
    g = got[gcols].sort_values(gcols).reset_index(drop=True)
    e = exp[ecols].sort_values(ecols).reset_index(drop=True)
    if len(g) != len(e):
        record(rows=False, schema=True, erows=len(e))
        fails.append((name, f"row count differs: spark={len(g)} duck={len(e)}"))
        flush_report()
        continue
    # dtype-tolerant compare (int32 vs int64 etc.), NaN == NaN
    import pandas as pd
    # DATE vs TIMESTAMP: Spark writes DateType as date objects, DuckDB
    # returns datetime64 — normalize both to datetime64[ns] so the value
    # compare (not the string fallback, which renders them differently)
    # decides
    for c in gcols:
        if str(g[c].dtype).startswith("datetime64") or str(e[c].dtype).startswith("datetime64"):
            try:
                g[c] = pd.to_datetime(g[c]).astype("datetime64[ns]")
                e[c] = pd.to_datetime(e[c]).astype("datetime64[ns]")
            except Exception:
                pass
    bad = None
    for c in gcols:
        gs, es = g[c], e[c]
        try:
            eq = (gs.isna() & es.isna()) | (gs == es)
        except Exception:
            eq = gs.astype(str) == es.astype(str)
        if not eq.all():
            i = int((~eq).idxmax())
            bad = f"col {c} row {i}: spark={gs[i]!r} duck={es[i]!r} ({int((~eq).sum())} diffs)"
            break
    if bad:
        record(rows=True, schema=True, value=False, erows=len(e), err=bad)
        fails.append((name, bad))
    else:
        record(rows=True, schema=True, value=True, erows=len(e))
        passes += 1
        print(f"  [ok] {name}: {len(g)} rows", flush=True)
    flush_report()

flush_report()
if report_path:
    print(f"\nwrote {report_path} ({len(report)} queries)")

print(f"\n{passes} ok, {skips} rows-only, {len(fails)} FAILED")
for n, msg in fails:
    print(f"  FAIL {n}: {msg}")
sys.exit(1 if fails else 0)
