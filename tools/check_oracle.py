import duckdb, json, sys, glob, math
import pyarrow.parquet as pq

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
ok = fail = 0
for name, sql in sorted(oracle.items()):
    try:
        spark_files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not spark_files:
            print(f"MISSING  {name} (no spark output)"); fail += 1; continue
        sdf = con.execute(f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").fetchdf()
        ddf = con.execute(sql).fetchdf()
        # driver-style: sort columns by name
        sdf = sdf[sorted(sdf.columns)]
        ddf = ddf[sorted(ddf.columns)]
        if list(sdf.columns) != list(ddf.columns):
            print(f"COLS     {name}: spark={list(sdf.columns)} duck={list(ddf.columns)}"); fail += 1; continue
        if len(sdf) != len(ddf):
            print(f"ROWS     {name}: spark={len(sdf)} duck={len(ddf)}"); fail += 1; continue
        mismatch = None
        for c in sdf.columns:
            a, b = sdf[c].tolist(), ddf[c].tolist()
            for i, (x, y) in enumerate(zip(a, b)):
                eq = (x == y)
                if not eq and isinstance(x, float) and isinstance(y, float):
                    eq = (math.isnan(x) and math.isnan(y)) or x == y
                if not eq:
                    mismatch = (c, i, x, y); break
            if mismatch: break
        if mismatch:
            c, i, x, y = mismatch
            print(f"VALUE    {name}: col={c} row={i} spark={x!r} duck={y!r}"); fail += 1
        else:
            print(f"OK       {name} ({len(sdf)} rows)"); ok += 1
    except Exception as e:
        print(f"ERROR    {name}: {str(e)[:160]}"); fail += 1
print(f"\n{ok} ok, {fail} fail")
