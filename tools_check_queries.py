"""Dev loop: exact-compare a NAMED SUBSET of registry queries against
their DuckDB oracles (same comparison as tools_drive_registry.py, which
drives the whole registry). Usage:

    python tools_check_queries.py q7_volume_shipping q10_returned_items
    DRIVE_SF_DIR=/root/testdata/sf0.1 python tools_check_queries.py ...
"""

import os, sys; sys.path.insert(0, "/root/repo")
import duckdb
from pyspark.sql import SparkSession
import __spark_entry__ as E

spark = (SparkSession.builder.master("local[16]")
         .config("spark.ui.enabled", "false")
         .config("spark.sql.shuffle.partitions", "16")
         .config("spark.ui.showConsoleProgress", "false").getOrCreate())
SF = os.environ.get("DRIVE_SF_DIR", "/root/testdata/sf0.01")
con = duckdb.connect()
for t in ("region nation customer supplier part orders lineitem "
          "events documents embeddings").split():
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

Q, O = E.queries(), E.oracle_sql()
bad = 0
for name in sys.argv[1:]:
    if name not in Q:
        print(f"ERR {name}: not registered"); bad += 1; continue
    sp = Q[name](spark, SF).toPandas()
    if name not in O:
        print(f"OK  {name}: rows-only, {len(sp)} rows"); continue
    dp = con.execute(O[name]).df()
    sp, dp = sp[sorted(sp.columns)], dp[sorted(dp.columns)]
    if list(sp.columns) != list(dp.columns):
        print(f"ERR {name}: cols {list(sp.columns)} vs {list(dp.columns)}"); bad += 1; continue
    dt = [(c, a, b) for c, a, b in zip(sp.columns, map(str, sp.dtypes), map(str, dp.dtypes)) if a != b]
    sp2 = sp.sort_values(by=list(sp.columns)).reset_index(drop=True)
    dp2 = dp.sort_values(by=list(dp.columns)).reset_index(drop=True)
    if dt:
        print(f"ERR {name}: dtypes {dt}"); bad += 1
    elif len(sp2) != len(dp2):
        print(f"ERR {name}: rows {len(sp2)} vs {len(dp2)}"); bad += 1
    elif not sp2.equals(dp2):
        neq = [c for c in sp2.columns if not sp2[c].equals(dp2[c])]
        print(f"ERR {name}: values differ in {neq}")
        for c in neq[:2]:
            m = sp2[c] != dp2[c]
            print(sp2[m].head(3).to_string(), "\n--vs--\n", dp2[m].head(3).to_string())
        bad += 1
    else:
        print(f"OK  {name}: {len(sp2)} rows exact")
sys.exit(1 if bad else 0)
