#!/usr/bin/env python3
"""Local pre-check that mimics the driver's DuckDB oracle compare:
for each entry in oracle_sql.json, run the SQL in DuckDB over the sf
parquet tables and compare (rows, schema-ish, values) with the Spark
parquet dump. Columns sorted by name, rows sorted by all columns.

Usage: python3 tools/oracle_check.py /root/testdata/sf0.01 /tmp/vout [name,name,...]

The optional third arg restricts the compare to a comma-separated entry
subset — pair it with graft.Verify's same-format filter for a fast
edit-verify loop on the entries a change touches. When checking a
non-sf0.01 directory, frozen-artifact paths inside the oracle SQL are
rewritten to the directory's basename (the driver does the same).
"""
import sys, json, glob, os
import duckdb
import pandas as pd

sfdir, outdir = sys.argv[1], sys.argv[2]
only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
con = duckdb.connect()
for p in glob.glob(f"{sfdir}/*.parquet"):
    name = p.split("/")[-1].removesuffix(".parquet")
    # driver testdata tables are single files; Spark-written tiers (e.g.
    # the r12 sf1 replica under target/testdata) are part-file directories
    src = f"{p}/*.parquet" if os.path.isdir(p) else p
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{src}')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
if only is not None:
    oracle = {k: v for k, v in oracle.items() if k in only}
base = os.path.basename(sfdir.rstrip("/"))
if base != "sf0.01":
    oracle = {k: v.replace("/sf0.01/", f"/{base}/") for k, v in oracle.items()}
fails = []
for name, sql in sorted(oracle.items()):
    try:
        odf = con.execute(sql).fetchdf()
    except Exception as e:
        print(f"{name}: ORACLE SQL ERROR: {e}")
        fails.append(name)
        continue
    sdf = pd.concat([pd.read_parquet(f) for f in glob.glob(f"{outdir}/{name}/*.parquet")])
    o = odf.reindex(sorted(odf.columns), axis=1)
    s = sdf.reindex(sorted(sdf.columns), axis=1)
    if list(o.columns) != list(s.columns):
        print(f"{name}: COLUMN MISMATCH oracle={list(o.columns)} spark={list(s.columns)}")
        fails.append(name)
        continue
    if len(o) != len(s):
        print(f"{name}: ROW COUNT oracle={len(o)} spark={len(s)}")
        fails.append(name)
        continue
    o = o.sort_values(list(o.columns)).reset_index(drop=True)
    s = s.sort_values(list(s.columns)).reset_index(drop=True)
    bad = None
    for c in o.columns:
        ov, sv = o[c], s[c]
        ok_, sk_ = ov.dtype.kind, sv.dtype.kind
        # The driver hashes rendered values: an int column on one side and a
        # float on the other renders 0 vs 0.0 and flips the hash even when
        # numerically equal (e.g. DuckDB HUGEINT window sums fetch as float64).
        # Mimic that: int-vs-float is a failure, not a coercion.
        if (ok_ == "f") != (sk_ == "f") and ok_ in "iuf" and sk_ in "iuf":
            bad = f"col {c}: DTYPE MISMATCH oracle={ov.dtype} spark={sv.dtype} (driver renders 0 vs 0.0 and hash-fails)"
            break
        if ok_ == "f" and sk_ == "f":
            eq = ov.combine(sv, lambda a, b: (pd.isna(a) and pd.isna(b)) or a == b)
        else:
            eq = ov.astype(str).fillna("<null>") == sv.astype(str).fillna("<null>")
        if not eq.all():
            i = eq.idxmin()
            bad = f"col {c} row {i}: oracle={ov[i]!r} spark={sv[i]!r} ({(~eq).sum()} diffs)"
            break
    if bad:
        print(f"{name}: VALUE MISMATCH {bad}")
        fails.append(name)
    else:
        print(f"{name}: OK ({len(o)} rows)")
print(f"\n{len(oracle) - len(fails)}/{len(oracle)} oracle queries match; fails: {fails}")

# declared rows-only entries: no oracle BY DESIGN — print the manifest so
# the artifact shows each one's twin/bound test instead of a bare no_oracle
try:
    rows_only = json.load(open(f"{outdir}/rows_only.json"))
    print(f"\n{len(rows_only)} rows-only entries (declared, each verified via a twin or bound test):")
    for name, reason in sorted(rows_only.items()):
        print(f"  {name}: {reason}")
except FileNotFoundError:
    pass
sys.exit(1 if fails else 0)
