"""Guard against cross-engine type-normalization hash mismatches.

The driver compares Spark and DuckDB results through a pandas/Arrow fetch
layer, where DuckDB HUGEINT (the result type of SUM over any integer) and
DECIMAL columns stringify differently from Spark's LONG/DOUBLE even when
the values are equal — the exact failure class behind round-1's three
hash mismatches. The repo's local checker uses ``fetchall`` (plain Python
ints), which hides it; this audit catches it statically by DESCRIBE-ing
every oracle and flagging any HUGEINT / DECIMAL / UHUGEINT output column.

Usage: python tools/audit_oracle_types.py [sf_dir]
"""

from __future__ import annotations

import sys

import duckdb

sys.path.insert(0, ".")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

BAD_TYPES = ("HUGEINT", "UHUGEINT", "DECIMAL")


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import __spark_entry__ as e

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    bad = []
    for name, sql in e.oracle_sql().items():
        try:
            desc = con.execute(f"DESCRIBE ({sql})").fetchall()
        except Exception as exc:  # noqa: BLE001 - report, don't crash the audit
            bad.append((name, "<describe failed>", str(exc).splitlines()[0]))
            continue
        for col, dtype, *_ in desc:
            if any(b in dtype.upper() for b in BAD_TYPES):
                bad.append((name, col, dtype))
    for name, col, dtype in bad:
        print(f"{name:28s} {col:24s} {dtype}")
    print("\nFLAGGED:", len(bad))
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
