import sys, os; sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession
spark = SparkSession.builder.master("local[8]").appName("driver-sim").getOrCreate()
import __spark_entry__ as e
df = e.entry(spark); print("entry rows:", df.count(), flush=True)   # smoke, sf0.001
import duckdb, pandas as pd
sf = "/root/testdata/sf0.01"                            # driver's correctness SF
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    p = f"{sf}/{t}.parquet"
    if os.path.exists(p): con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
qs, osql = e.queries(), e.oracle_sql()
def norm(pdf):
    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        if pd.api.types.is_datetime64_any_dtype(pdf[c]): pdf[c] = pd.to_datetime(pdf[c]).astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(pdf[c]): pdf[c] = pdf[c].astype("float64")
        elif pd.api.types.is_integer_dtype(pdf[c]): pdf[c] = pdf[c].astype("Int64")
    return pdf.sort_values(list(pdf.columns), kind="mergesort").reset_index(drop=True)
bad = []
for name, fn in qs.items():
    spdf = fn(spark, sf).toPandas()
    if name not in osql: print(f"[{name}] rows-only: {len(spdf)}", flush=True); continue
    a, b = norm(spdf), norm(con.execute(osql[name]).df())
    ok = a.shape == b.shape and list(a.columns) == list(b.columns) and a.equals(b)
    print(f"[{name}] rows={len(a)} exact={ok}", flush=True)
    if not ok: bad.append(name)
print("MISMATCHES:", bad or "none")
spark.stop()
