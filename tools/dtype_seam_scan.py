"""Cross-engine column-TYPE seam scanner (round 8).

Round-7's five driver hash-reds all turned out to pair a Spark BIGINT
column with a DuckDB HUGEINT column: DuckDB's SUM(BIGINT) widens to
HUGEINT (int128), its pandas bridge materializes HUGEINT as float64, and
a value-level canonicalizer that does NOT collapse integer-valued floats
then hashes "1000.0" against Spark's "1000" — rows and schema (column
NAMES) still match, only the value hash reds. The local gate masked the
class because tools/verify_local.py's canon_cell collapsed int-valued
floats (removed this round).

This scanner works at the TYPE level, not the value level: the Spark
side is analyzed via DataFrame.schema, the DuckDB side via DESCRIBE
(bind-only). NOTE the Spark side is plan-only for most builders but NOT
all — a handful of builders materialize eagerly while constructing the
plan (localCheckpoint(eager=True) in sketch_kmv_source_overlap, the
checkpointing IVF builders), so a full-registry scan does run those
queries' upstream jobs. That costs a couple of minutes at sf0.01 and is
accepted: the checkpoint IS the plan those queries ship, and faking a
lazy variant would scan a different plan than production runs.
Each column is mapped to a repr FAMILY (int /
float / decimal / bool / string / date / timestamp / list); any query
whose two sides disagree on a family is a hash-red waiting to happen on
SOME engine version, whatever the values.

Usage: python tools/dtype_seam_scan.py [--sf-dir DIR] [name ...]
Exit 1 if any mismatch. Also invoked by tests/test_dtype_seam.py.
"""

from __future__ import annotations

import argparse
import os
import re
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sig_etl_spark.queries import QUERIES
from sig_etl_spark.tables import TABLE_NAMES

# Spark simpleString -> repr family
_SPARK_FAMILY = (
    (re.compile(r"^(tinyint|smallint|int|bigint)$"), "int"),
    (re.compile(r"^(float|double)$"), "float"),
    (re.compile(r"^decimal\(.*\)$"), "decimal"),
    (re.compile(r"^boolean$"), "bool"),
    (re.compile(r"^(string|varchar.*|char.*)$"), "string"),
    # Spark DateType reaches pandas as OBJECT datetime.date ("2024-01-01")
    # while TimestampType becomes datetime64 — different repr families.
    (re.compile(r"^date$"), "date"),
    (re.compile(r"^timestamp(_ntz)?$"), "datetime"),
    (re.compile(r"^array<.*>$"), "list"),
    (re.compile(r"^binary$"), "binary"),
)

# DuckDB DESCRIBE type -> repr family. HUGEINT is deliberately NOT "int":
# the pandas bridge makes it float64 (duckdb 1.0) — it reprs as a float.
_DUCK_FAMILY = (
    (re.compile(r"^(U?TINYINT|U?SMALLINT|U?INTEGER|U?BIGINT)$"), "int"),
    (re.compile(r"^(HUGEINT|UHUGEINT)$"), "hugeint"),
    (re.compile(r"^(FLOAT|DOUBLE)$"), "float"),
    (re.compile(r"^DECIMAL\(.*\)$"), "decimal"),
    (re.compile(r"^BOOLEAN$"), "bool"),
    (re.compile(r"^VARCHAR$"), "string"),
    # DuckDB's pandas bridge converts BOTH DATE and TIMESTAMP to
    # datetime64 — a duck DATE safely pairs with a Spark timestamp
    # (driver-green in 16 queries, e.g. j_bloom_pruned.order_month) but
    # NOT with a Spark date (object datetime.date repr).
    (re.compile(r"^DATE$"), "datetime"),
    (re.compile(r"^TIMESTAMP.*$"), "datetime"),
    (re.compile(r".*\[\]$"), "list"),
    (re.compile(r"^BLOB$"), "binary"),
)


def _family(table, typ: str) -> str:
    for pat, fam in table:
        if pat.match(typ):
            return fam
    return f"?{typ}"


# Probes whose oracle DELIBERATELY exhibits the seam (measurement rows,
# documented in queries/diag_seam.py — PYTEST FIXTURES since round 9,
# no longer registered) — never add a production query.
EXPECTED_DIVERGENT = frozenset({"diag_seam_hugeint_raw"})


def scan(
    sf_dir: str,
    names: list[str] | None = None,
    extra: dict | None = None,
) -> list[str]:
    """Return mismatch strings (empty = clean).

    ``extra`` maps name -> RegisteredQuery for test-only fixtures that
    live outside the registry (queries/diag_seam.py PROBE_QUERIES).
    """
    from sig_etl_spark.session import get_spark

    spark = get_spark("dtype_seam_scan")
    con = duckdb.connect()
    for t in TABLE_NAMES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        pat = os.path.join(path, "*.parquet") if os.path.isdir(path) else path
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{pat}')")

    lookup = {**QUERIES, **(extra or {})}
    problems: list[str] = []
    for name in names or list(QUERIES):
        rq = lookup[name]
        if rq.oracle is None or name in EXPECTED_DIVERGENT:
            continue
        try:
            sdf = rq.builder(spark, sf_dir)
            s_types = {f.name: f.dataType.simpleString() for f in sdf.schema.fields}
        except Exception as e:  # noqa: BLE001
            problems.append(f"{name}: spark plan error: {e}")
            continue
        try:
            desc = con.execute(f"DESCRIBE SELECT * FROM ({rq.oracle})").fetchall()
        except Exception as e:  # noqa: BLE001
            problems.append(f"{name}: duckdb bind error: {e}")
            continue
        d_types = {r[0]: r[1] for r in desc}
        for col in sorted(set(s_types) & set(d_types)):
            sf = _family(_SPARK_FAMILY, s_types[col])
            df_ = _family(_DUCK_FAMILY, d_types[col])
            # Decimals repr at their SCALE ("1.50" vs "1.5000000000"), so
            # family parity is not enough — the scales must agree too.
            if sf == "decimal" and df_ == "decimal":
                s_scale = re.search(r",\s*(\d+)\)", s_types[col])
                d_scale = re.search(r",\s*(\d+)\)", d_types[col])
                if not s_scale or not d_scale or s_scale.group(1) != d_scale.group(1):
                    problems.append(
                        f"{name}.{col}: decimal scale mismatch "
                        f"spark={s_types[col]} duck={d_types[col]}"
                    )
                continue
            # hugeint reprs as float on at least one engine bridge and as
            # int on others — it NEVER safely pairs with anything.
            ok = sf == df_ or (sf == "string" and df_ == "string")
            if df_ == "hugeint" or sf.startswith("?") or df_.startswith("?") or not ok:
                problems.append(
                    f"{name}.{col}: spark={s_types[col]}({sf}) duck={d_types[col]}({df_})"
                )
    return problems


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()
    problems = scan(args.sf_dir, args.names or None)
    for p in problems:
        print(f"DTYPE-SEAM  {p}")
    print(f"{len(problems)} mismatches")
    return 1 if problems else 0


if __name__ == "__main__":
    sys.exit(main())
