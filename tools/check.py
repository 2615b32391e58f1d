#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: compare Verify output
parquet vs DuckDB oracle results (sorted columns by name, hashed values)."""
import sys, json, glob, os
import duckdb, pandas as pd

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    p = f"{sf_dir}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
def canon(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]")
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        if str(df[c].dtype) in ("int32","int64","uint64","Int64"):
            df[c] = df[c].astype("int64")
        if str(df[c].dtype) in ("float32",):
            df[c] = df[c].astype("float64")
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

fails = 0

# Every query in the manifest must produce output — a thrown query leaves
# no parquet dir, and iterating only oracle keys hides rows-only breaks
# entirely (the q28 r6 lesson, generalized). Rows-only queries (no oracle
# SQL) get an existence + row-count check here; their semantics are pinned
# by ScalaTest specs.
manifest_path = f"{out_dir}/queries.json"
if os.path.exists(manifest_path):
    manifest = json.load(open(manifest_path))
    for name in sorted(set(manifest) - set(oracle)):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output (rows-only)"); fails += 1; continue
        n = sum(len(pd.read_parquet(f)) for f in files)
        if n == 0:
            print(f"WARN {name}: rows-only query returned 0 rows")
        print(f"PASS {name} (rows-only, {n} rows)")

for name in sorted(oracle):
    files = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output"); fails += 1; continue
    spark_df = canon(pd.concat([pd.read_parquet(f) for f in files]))
    try:
        duck_df = canon(con.execute(oracle[name]).fetchdf())
    except Exception as e:
        print(f"FAIL {name}: oracle error {e}"); fails += 1; continue
    if list(spark_df.columns) != list(duck_df.columns):
        print(f"FAIL {name}: cols {list(spark_df.columns)} vs {list(duck_df.columns)}"); fails += 1; continue
    if len(spark_df) != len(duck_df):
        print(f"FAIL {name}: rows {len(spark_df)} vs {len(duck_df)}"); fails += 1; continue
    # post-canon dtype mismatch (e.g. DuckDB HUGEINT -> float64/object)
    # fails the driver's hash even when values print identically
    dt = [(c, str(spark_df[c].dtype), str(duck_df[c].dtype))
          for c in spark_df.columns
          if str(spark_df[c].dtype) != str(duck_df[c].dtype)]
    if dt:
        print(f"FAIL {name}: dtype mismatch {dt}"); fails += 1; continue
    eq = spark_df.equals(duck_df)
    if not eq:
        try:
            pd.testing.assert_frame_equal(spark_df, duck_df, check_dtype=False, check_exact=True)
            eq = True
        except AssertionError as e:
            print(f"FAIL {name}: values differ\n{str(e)[:500]}")
            print("spark:", spark_df.head(3).to_dict(), "\nduck:", duck_df.head(3).to_dict())
            fails += 1; continue
    print(f"PASS {name} ({len(spark_df)} rows)")
print("ALL PASS" if fails == 0 else f"{fails} FAILURES")
sys.exit(1 if fails else 0)
