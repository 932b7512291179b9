"""Drive the ENTIRE query registry the way the grading driver does:
vanilla SparkSession (ANSI on), every queries() entry executed at
sf0.01 and compared against its oracle_sql() in DuckDB — exact values
AND exact pandas dtypes (stricter than the driver's hash, which
normalizes integer width). Run before every round-end:

    python tools_drive_registry.py          # ~3 min on local[16]

Prints one WARN/ERR line per discrepancy and a final count; exit code
is nonzero when anything is flagged.
"""

import os, sys, math; sys.path.insert(0, "/root/repo")
import duckdb
import pandas as pd
from pyspark.sql import SparkSession
import __spark_entry__ as E

spark = (SparkSession.builder.master("local[16]")
         .config("spark.ui.enabled","false")
         .config("spark.sql.shuffle.partitions","16")
         .config("spark.ui.showConsoleProgress","false").getOrCreate())
SF = os.environ.get("DRIVE_SF_DIR", "/root/testdata/sf0.01")
con = duckdb.connect()
for t in ("region nation customer supplier part orders lineitem "
          "events documents embeddings").split():
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

Q = E.queries(); O = E.oracle_sql()
only = {n for n in os.environ.get("DRIVE_ONLY", "").split(",") if n}
mismatch = []
for name in Q:
    if name not in O or (only and name not in only):
        continue
    try:
        sp = Q[name](spark, SF).toPandas()
        dp = con.execute(O[name]).df()
        sp = sp[sorted(sp.columns)]; dp = dp[sorted(dp.columns)]
        notes = []
        if list(sp.columns) != list(dp.columns):
            notes.append(f"cols {list(sp.columns)} vs {list(dp.columns)}")
        else:
            dt_s, dt_d = list(map(str, sp.dtypes)), list(map(str, dp.dtypes))
            if dt_s != dt_d:
                diff = [(c,a,b) for c,a,b in zip(sp.columns, dt_s, dt_d) if a!=b]
                notes.append(f"dtypes {diff}")
            sp2 = sp.sort_values(by=list(sp.columns)).reset_index(drop=True)
            dp2 = dp.sort_values(by=list(dp.columns)).reset_index(drop=True)
            if len(sp2) != len(dp2):
                notes.append(f"rows {len(sp2)} vs {len(dp2)}")
            elif not sp2.equals(dp2):
                # float-tolerant fallback
                ok = True
                for c in sp2.columns:
                    a, b = sp2[c], dp2[c]
                    if a.dtype.kind == "f" or b.dtype.kind == "f":
                        if not ((a.isna() == b.isna()).all() and
                                (abs(a.fillna(0) - b.fillna(0)) <= 1e-9 + 1e-9*abs(b.fillna(0))).all()):
                            ok = False
                    elif not a.equals(b):
                        ok = False
                if not ok:
                    notes.append("VALUES differ")
                else:
                    notes.append("float-tol only (exact repr differs)")
        if notes:
            mismatch.append((name, notes))
            print("WARN", name, notes, flush=True)
    except Exception as exc:
        mismatch.append((name, [f"ERROR {exc}"]))
        print("ERR", name, str(exc)[:200], flush=True)
print(
    f"checked {sum(1 for n in Q if n in O and (not only or n in only))} "
    f"oracle queries, {len(mismatch)} flagged"
)
sys.exit(1 if mismatch else 0)
