import duckdb, json, sys, glob
import pandas as pd
sfdir = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.01'
outdir = sys.argv[2] if len(sys.argv) > 2 else '/tmp/verify1'
con = duckdb.connect()
for t in ['region','nation','customer','supplier','part','orders','lineitem','events','documents','embeddings']:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
oracle = json.load(open(f'{outdir}/oracle_sql.json'))
for name, sql in sorted(oracle.items()):
    try:
        exp = con.sql(sql).df()
    except Exception as e:
        print(f"{name}: ORACLE SQL ERROR: {e}"); continue
    try:
        got = pd.concat([pd.read_parquet(f) for f in glob.glob(f'{outdir}/{name}/*.parquet')])
    except Exception as e:
        print(f"{name}: SPARK RESULT MISSING: {e}"); continue
    exp = exp.reindex(sorted(exp.columns), axis=1)
    got = got.reindex(sorted(got.columns), axis=1)
    if list(exp.columns) != list(got.columns):
        print(f"{name}: SCHEMA MISMATCH exp={list(exp.columns)} got={list(got.columns)}"); continue
    if len(exp) != len(got):
        print(f"{name}: ROWCOUNT exp={len(exp)} got={len(got)}"); continue
    es = exp.sort_values(by=list(exp.columns)).reset_index(drop=True).astype(str)
    gs = got.sort_values(by=list(got.columns)).reset_index(drop=True).astype(str)
    if es.equals(gs):
        print(f"{name}: OK ({len(exp)} rows)")
    else:
        neq = (es != gs).any(axis=1)
        print(f"{name}: VALUE MISMATCH in {neq.sum()}/{len(es)} rows")
        print(pd.concat([es[neq].head(3).add_prefix('exp_'), gs[neq].head(3).add_prefix('got_')], axis=1).to_string())
