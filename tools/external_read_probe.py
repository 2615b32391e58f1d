#!/usr/bin/env python3
"""Measured external-reader probe for the ManifestLog-vs-Rename default
decision (r17; r16 verdict What's-missing #4).

Question: can an external, committer-unaware engine (DuckDB here, the
stand-in for any plain parquet reader) consume a table written by each
committer by just pointing at the table path?

Builds both layouts by hand exactly as the committers lay them out
(Store.scala: Rename = plain directory of parquet; ManifestLog =
dst.mlog/manifest.<gen>.json + dst.mdata/<gen-uuid>/ generation dirs),
with TWO committed generations so stale-data mixing is observable, and
records what each read attempt does.
"""
import duckdb, pandas as pd, os, shutil, json, sys

base = "/tmp/ext_read_probe"
shutil.rmtree(base, ignore_errors=True)
os.makedirs(base)

gen1 = pd.DataFrame({"k": [1, 2], "v": ["a", "b"]})
gen2 = pd.DataFrame({"k": [1, 2, 3], "v": ["a", "B", "c"]})  # head

# --- Rename committer layout: the table IS a plain directory ---
rn = f"{base}/rename_tbl"
os.makedirs(rn)
gen2.to_parquet(f"{rn}/part-00000.parquet")

# --- ManifestLog layout: no plain dir; generations + manifests ---
ml = f"{base}/ml_tbl"          # note: this path itself does NOT exist
os.makedirs(f"{ml}.mlog")
os.makedirs(f"{ml}.mdata/{1:020d}-aaaa1111")
os.makedirs(f"{ml}.mdata/{2:020d}-bbbb2222")
gen1.to_parquet(f"{ml}.mdata/{1:020d}-aaaa1111/part-00000.parquet")
gen2.to_parquet(f"{ml}.mdata/{2:020d}-bbbb2222/part-00000.parquet")
with open(f"{ml}.mlog/manifest.{1:020d}.json", "w") as f:
    f.write(json.dumps({"gen": 1, "data": f"{1:020d}-aaaa1111"}))
with open(f"{ml}.mlog/manifest.{2:020d}.json", "w") as f:
    f.write(json.dumps({"gen": 2, "data": f"{2:020d}-bbbb2222"}))

con = duckdb.connect()
def attempt(label, sql):
    try:
        rows = con.execute(sql).fetchall()
        print(f"  {label}: OK, {len(rows)} rows -> {sorted(rows)}")
        return len(rows)
    except Exception as e:
        print(f"  {label}: FAILS ({type(e).__name__}: {str(e)[:90]})")
        return None

print("Rename committer (plain directory):")
attempt("read_parquet(dst/*.parquet)",
        f"SELECT * FROM read_parquet('{rn}/*.parquet')")

print("ManifestLog committer:")
attempt("read_parquet(dst/*.parquet)        [naive]",
        f"SELECT * FROM read_parquet('{ml}/*.parquet')")
n = attempt("read_parquet(dst.mdata/*/*.parquet) [glob]",
        f"SELECT * FROM read_parquet('{ml}.mdata/*/*.parquet')")
if n is not None and n != len(gen2):
    print(f"    ^ WRONG DATA: {n} rows vs head's {len(gen2)} — "
          "the glob unions every retained generation")
# the manifest-aware protocol an external reader would have to implement
ms = sorted(os.listdir(f"{ml}.mlog"))
head = json.load(open(f"{ml}.mlog/{ms[-1]}"))
attempt("manifest-aware 3-step (list+parse+read)",
        f"SELECT * FROM read_parquet('{ml}.mdata/{head['data']}/*.parquet')")
print("Conclusion: a committer-unaware reader gets Rename tables for "
      "free, and for ManifestLog either errors (naive path) or silently "
      "unions stale generations (glob); correct access needs the "
      "3-step manifest protocol.")
