#!/usr/bin/env python3
"""Dev tool: replicate the driver's correctness gate locally.

Runs each oracle SQL from outDir/oracle_sql.json in DuckDB against the
sf parquet tables, loads the corresponding Spark result parquet, and
compares schema + values (columns sorted by name, rows sorted)."""
import json, sys, glob
import duckdb

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    # driver tables are single files; ScaleUp-generated ones are dirs
    src = f"{sf_dir}/{t}.parquet"
    if glob.glob(f"{src}/*.parquet"):
        src = f"{src}/*.parquet"
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
fails, passes, rows_only = [], [], []
names = sorted(set(list(oracle.keys()) + [p.split('/')[-1] for p in glob.glob(f"{out_dir}/q_*")]))
for name in names:
    path = f"{out_dir}/{name}"
    if not glob.glob(f"{path}/*.parquet"):
        fails.append((name, "no spark output")); continue
    spark_rel = con.sql(f"SELECT * FROM '{path}/*.parquet'")
    if name not in oracle:
        rows_only.append((name, len(spark_rel.fetchall()))); continue
    try:
        oracle_rel = con.sql(oracle[name])
        sdf = spark_rel.df(); odf = oracle_rel.df()
        sdf = sdf[sorted(sdf.columns)]; odf = odf[sorted(odf.columns)]
        if list(sdf.columns) != list(odf.columns):
            fails.append((name, f"cols {list(sdf.columns)} vs {list(odf.columns)}")); continue
        if [str(t) for t in sdf.dtypes] != [str(t) for t in odf.dtypes]:
            fails.append((name, f"dtypes {list(zip(sdf.columns, sdf.dtypes, odf.dtypes))}")); continue
        if len(sdf) != len(odf):
            fails.append((name, f"rows {len(sdf)} vs {len(odf)}")); continue
        svals = sdf.sort_values(by=list(sdf.columns)).reset_index(drop=True)
        ovals = odf.sort_values(by=list(odf.columns)).reset_index(drop=True)
        if not svals.equals(ovals):
            neq = (svals != ovals) & ~(svals.isna() & ovals.isna())
            bad = neq.any(axis=1)
            fails.append((name, f"values differ in {int(bad.sum())} rows; first:\n"
                          f"spark: {svals[bad].head(3).to_dict('records')}\n"
                          f"oracle:{ovals[bad].head(3).to_dict('records')}"))
            continue
        passes.append(name)
    except Exception as e:
        fails.append((name, f"oracle error: {str(e)[:300]}"))

print(f"PASS ({len(passes)}): {' '.join(passes)}")
print(f"ROWS-ONLY ({len(rows_only)}): {rows_only}")
print(f"FAIL ({len(fails)}):")
for n, msg in fails:
    print(f"  {n}: {msg}")
sys.exit(1 if fails else 0)
