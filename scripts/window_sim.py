"""Driver-window simulation: grade the FIRST ~50 registry entries at
sf0.01 with a PLAIN SparkSession + the DuckDB oracle — exactly what
CORRECTNESS_r{N}.json will record. Run per round before committing:

    python scripts/window_sim.py            # writes CORRECTNESS_LOCAL_SIM.json
    SIM_OUT=CORRECTNESS_LOCAL_r10.json python scripts/window_sim.py
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
os.chdir(REPO)
sys.path.insert(0, REPO)

from pyspark.sql import SparkSession  # noqa: E402

spark = SparkSession.builder.master("local[8]").appName("driver-sim").getOrCreate()
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as e  # noqa: E402

from java_iceberg_table_spark.oracle import compare, duck_connect  # noqa: E402

qs, osql = e.queries(), e.oracle_sql()
sf = os.environ.get("SIM_SF_DIR", "/root/testdata/sf0.01")
con = duck_connect(sf)
out, t_all = {}, time.time()
for name in list(qs)[:50]:
    t0 = time.time()
    rec = {"rows_match": None, "schema_match": None, "hash_match": None,
           "spark_rows": None, "oracle_rows": None, "err": None}
    try:
        sp = qs[name](spark, sf).toPandas()
        rec["spark_rows"] = len(sp)
        if name in osql:
            dk = con.execute(osql[name]).df()
            rec["oracle_rows"] = len(dk)
            problems = compare(sp, dk)
            rec["rows_match"] = len(sp) == len(dk)
            rec["schema_match"] = not any("column mismatch" in p for p in problems)
            rec["hash_match"] = not problems
            if problems:
                rec["err_detail"] = problems[:3]
        else:
            rec["rows_match"] = True
    except Exception as ex:  # noqa: BLE001 — the sim must grade every row
        rec["err"] = f"{type(ex).__name__}: {ex}"[:500]
    rec["sec"] = round(time.time() - t0, 2)
    out[name] = rec
    ok = rec["err"] is None and rec.get("hash_match") in (True, None)
    print(f"{'OK' if ok else 'FAIL'} {name} {rec['sec']}s", flush=True)

dest = os.environ.get("SIM_OUT", "CORRECTNESS_LOCAL_SIM.json")
json.dump(out, open(dest, "w"), indent=1)
bad = [n for n, r in out.items() if r["err"] or r["hash_match"] is False]
print(f"TOTAL {round(time.time() - t_all, 1)}s  bad={bad}  -> {dest}")
