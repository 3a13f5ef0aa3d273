"""Driver-mimic correctness gate: run every registered query on Spark
AND its DuckDB oracle, compare row count, column names, and an
order-insensitive value hash.

Usage: python tools/check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import math
import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> str:
    """Order-insensitive canonical hash of a result frame."""
    df = df[sorted(df.columns)].copy()
    cells = []
    for _, row in df.iterrows():
        parts = []
        for v in row:
            if v is None or (isinstance(v, float) and math.isnan(v)):
                parts.append("NULL")
            elif isinstance(v, float):
                parts.append(f"{v:.6f}")
            else:
                parts.append(str(v))
        cells.append("|".join(parts))
    cells.sort()
    return hashlib.sha256("\n".join(cells).encode()).hexdigest()[:16]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from astra_perseverance_spark import get_spark
    from astra_perseverance_spark.oracle import ORACLE_SQL
    from astra_perseverance_spark.queries import NO_ORACLE, QUERY_REGISTRY

    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    failures = []
    for name, fn in QUERY_REGISTRY.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {e}")
            failures.append(name)
            continue
        t_spark = time.time() - t0
        if name in NO_ORACLE or name not in ORACLE_SQL:
            print(f"SKIP-ORACLE {name}: rows={len(sdf)} ({t_spark:.1f}s)")
            continue
        try:
            odf = con.sql(ORACLE_SQL[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {e}")
            failures.append(name)
            continue
        problems = []
        if len(sdf) != len(odf):
            problems.append(f"rows {len(sdf)} != {len(odf)}")
        if sorted(sdf.columns) != sorted(odf.columns):
            problems.append(f"cols {sorted(sdf.columns)} != {sorted(odf.columns)}")
        else:
            hs, ho = canon(sdf), canon(odf)
            if hs != ho:
                problems.append(f"hash {hs} != {ho}")
        if problems:
            print(f"FAIL {name}: {'; '.join(problems)}")
            failures.append(name)
            # dump small diff sample
            try:
                cols = sorted(set(sdf.columns) & set(odf.columns))
                s2 = sdf[cols].sort_values(cols).reset_index(drop=True)
                o2 = odf[cols].sort_values(cols).reset_index(drop=True)
                if len(s2) == len(o2):
                    neq = (s2.astype(str) != o2.astype(str)).any(axis=1)
                    if neq.any():
                        i = neq.idxmax()
                        print("  spark :", s2.loc[i].to_dict())
                        print("  oracle:", o2.loc[i].to_dict())
            except Exception:  # noqa: BLE001
                pass
        else:
            print(f"OK   {name}: rows={len(sdf)} hash match ({t_spark:.1f}s)")
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
