"""Local replica of the driver's DuckDB oracle gate: run every queries()
entry that has an oracle_sql() twin at sf0.01 and compare rows + schema +
order-insensitive value hash (columns sorted by name, rows sorted by value).

Usage: python jobs/oracle_check.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

TABLES = (
    "region nation customer supplier part orders lineitem events documents "
    "embeddings"
).split()


def _canon(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf[sorted(pdf.columns)]
    for c in pdf.columns:
        if pdf[c].dtype == object:
            pdf[c] = pdf[c].astype(str)
        elif pdf[c].dtype.kind == "f":
            pdf[c] = pdf[c].round(6)
        elif pdf[c].dtype.kind == "b" or str(pdf[c].dtype) == "boolean":
            pdf[c] = pdf[c].astype("int64")
        elif pdf[c].dtype.kind in "iu":
            pdf[c] = pdf[c].astype("int64")
    return pdf.sort_values(by=list(pdf.columns)).reset_index(drop=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from dedup_spark.session import get_spark
    import __spark_entry__ as entry

    spark = get_spark(app="oracle_check", master="local[8]")
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    reg, oracles = entry.queries(), entry.oracle_sql()
    failures = []
    for name, sql in oracles.items():
        sdf = _canon(reg[name](spark, sf_dir).toPandas())
        odf = _canon(con.execute(sql).df())
        rows_ok = len(sdf) == len(odf)
        schema_ok = list(sdf.columns) == list(odf.columns)
        val_ok = rows_ok and schema_ok and sdf.equals(odf)
        status = "OK" if (rows_ok and schema_ok and val_ok) else "FAIL"
        print(f"{status:4} {name}: rows {len(sdf)}/{len(odf)} "
              f"schema={schema_ok} values={val_ok}")
        if status == "FAIL":
            failures.append(name)
            if not schema_ok:
                print(f"     spark cols: {list(sdf.columns)}")
                print(f"     oracle cols: {list(odf.columns)}")
            elif rows_ok and len(sdf):
                neq = (sdf != odf).any(axis=1)
                print(sdf[neq].head(3))
                print(odf[neq].head(3))
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
