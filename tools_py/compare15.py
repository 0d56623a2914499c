#!/usr/bin/env python3
"""Driver-style correctness compare: Verify parquet dumps vs DuckDB oracle.
Usage: compare15.py <sfDir> <verifyOutDir>"""
import duckdb, json, sys, glob

sf, out = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ['lineitem','orders','customer','part','supplier','nation','region',
          'events','documents','embeddings']:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
sql = json.load(open(f'{out}/oracle_sql.json'))
fails = 0
for name in sorted(sql):
    files = glob.glob(f'{out}/{name}/*.parquet')
    if not files:
        print(f'{name:32s} NO-DUMP'); fails += 1; continue
    try:
        sp = con.execute(f"SELECT * FROM read_parquet('{files[0]}')").fetchdf()
        orc = con.execute(sql[name]).fetchdf()
    except Exception as e:
        print(f'{name:32s} ERR {e}'); fails += 1; continue
    def canon(df):
        df = df[sorted(df.columns)]
        return df.sort_values(list(df.columns), kind='mergesort',
                              ignore_index=True)
    rows = len(sp) == len(orc)
    schema = sorted(sp.columns) == sorted(orc.columns)
    if not (rows and schema):
        print(f'{name:32s} rows={rows}({len(sp)}/{len(orc)}) schema={schema}')
        fails += 1; continue
    s, o = canon(sp), canon(orc)
    dt = list(map(str, s.dtypes)) == list(map(str, o.dtypes))
    try:
        val = s.equals(o)
        if not val:
            # tolerate float representation wobble: compare column-wise
            import numpy as np
            val = True
            for c in s.columns:
                a, b = s[c], o[c]
                if str(a.dtype).startswith('float') and str(b.dtype).startswith('float'):
                    if not np.allclose(a, b, rtol=1e-12, atol=1e-12, equal_nan=True):
                        val = False; break
                elif not a.equals(b):
                    val = False; break
    except Exception as e:
        val = f'cmp-err {e}'
    status = 'OK' if (dt and val is True) else f'dtype={dt} values={val}'
    if status != 'OK':
        fails += 1
        print(f'{name:32s} {status}  dtypes sp={list(map(str,s.dtypes))} orc={list(map(str,o.dtypes))}')
    else:
        print(f'{name:32s} OK ({len(sp)} rows)')
print('FAILS:', fails)
sys.exit(1 if fails else 0)
