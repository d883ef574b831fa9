"""Oracle-checked extraction query: parse(render(x)) == x.

The driver's tables contain no HTML, so this query *renders* orders rows
into HTML table pages inside Spark (deterministically), runs the real S3
parse UDF over them, and emits the recovered records. The DuckDB oracle
selects the same rows directly — any parser defect (header zip, row
order, whitespace, explode) breaks the hash.
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sig_etl_spark.extract import extract_records, stabilize_columns
from sig_etl_spark.queries import register
from sig_etl_spark.tables import load_table

_ORACLE = """
SELECT o_custkey % 20 AS page,
       CAST(o_orderkey AS VARCHAR) AS orderkey,
       o_orderstatus AS status,
       o_orderpriority AS priority
FROM orders
"""


@register(
    "extract_s3_roundtrip",
    oracle=_ORACLE,
    doc="S3 table scan: render orders to HTML pages, parse back via the"
        " pandas UDF, recover every row",
)
def extract_s3_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    row_html = F.concat(
        F.lit("<tr><td>"), F.col("o_orderkey").cast("string"),
        F.lit("</td><td>"), F.col("o_orderstatus"),
        F.lit("</td><td>"), F.col("o_orderpriority"),
        F.lit("</td></tr>"),
    )
    pages = (
        orders.withColumn("page", F.col("o_custkey") % 20)
        .groupBy("page")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("o_orderkey"), row_html.alias("tr")))
            ).alias("rows")
        )
        .select(
            "page",
            F.concat(
                F.lit(
                    "<html><body><table><thead><tr><th>orderkey</th>"
                    "<th>status</th><th>priority</th></tr></thead><tbody>"
                ),
                F.array_join(F.transform(F.col("rows"), lambda r: r["tr"]), ""),
                F.lit("</tbody></table></body></html>"),
            ).alias("html"),
        )
    )
    # Explicit-count repartition: AQE would coalesce the tiny rendered-page
    # shuffle to 1-2 partitions, serializing the Python parse; a numbered
    # repartition is exempt from coalescing, so each page parses in its own
    # task. (Real landing zones get this for free: one file = one split.)
    records = extract_records(pages.repartition(20, "page"), parser="table")
    flat = stabilize_columns(records, keys=["orderkey", "status", "priority"])
    return flat.select("page", "orderkey", "status", "priority")


# ---------------------------------------------------------------------------
# S4: card scan — render customers as card markup, parse back with the
# real card extractor (data-field spans + link target -> candidate_url,
# the P5-style header augmentation).
# Reference shape: national/_2994/endorse/extract.py:19-37.
# ---------------------------------------------------------------------------

_CARDS_ORACLE = """
SELECT c_custkey % 10 AS page,
       c_name AS name,
       c_mktsegment AS segment,
       'https://cards.example/c/' || CAST(c_custkey AS VARCHAR) AS candidate_url
FROM customer
"""


@register(
    "extract_s4_cards",
    oracle=_CARDS_ORACLE,
    doc="S4 card scan: render customers to card markup, parse back via the"
        " pandas UDF, recover every record",
)
def extract_s4_cards(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    card_html = F.concat(
        F.lit('<div class="card"><span data-field="name">'), F.col("c_name"),
        F.lit('</span><span data-field="segment">'), F.col("c_mktsegment"),
        F.lit('</span><a href="https://cards.example/c/'),
        F.col("c_custkey").cast("string"),
        F.lit('">profile</a></div>'),
    )
    pages = (
        cust.withColumn("page", F.col("c_custkey") % 10)
        .groupBy("page")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("c_custkey"), card_html.alias("card")))
            ).alias("cards")
        )
        .select(
            "page",
            F.concat(
                F.lit("<html><body>"),
                F.array_join(F.transform(F.col("cards"), lambda c: c["card"]), ""),
                F.lit("</body></html>"),
            ).alias("html"),
        )
    )
    records = extract_records(pages.repartition(10, "page"), parser="cards")
    flat = stabilize_columns(records, keys=["name", "segment", "candidate_url"])
    return flat.select("page", "name", "segment", "candidate_url")


# ---------------------------------------------------------------------------
# S5: nested scan + flatten — region > nation > supplier rendered as the
# group/position/candidate hierarchy; inner records inherit the outer
# data-* attributes exactly like the reference's election-group walk.
# Reference shape: national/_1034/extract.py:26-74.
# ---------------------------------------------------------------------------

_NESTED_ORACLE = """
SELECT r_name AS region, n_name AS nation, s_name AS name,
       CAST(s_acctbal AS VARCHAR) AS acctbal
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
"""


@register(
    "extract_s5_nested",
    oracle=_NESTED_ORACLE,
    doc="S5 nested scan: render region>nation>supplier hierarchy, parse"
        " back with attribute inheritance, recover every leaf",
)
def extract_s5_nested(spark: SparkSession, sf_dir: str) -> DataFrame:
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region")
    cand_html = F.concat(
        F.lit('<div class="candidate"><span data-field="name">'), F.col("s_name"),
        F.lit('</span><span data-field="acctbal">'), F.col("s_acctbal").cast("string"),
        F.lit("</span></div>"),
    )
    nations = (
        sup.join(F.broadcast(nat), sup["s_nationkey"] == nat["n_nationkey"])
        .groupBy("n_nationkey", "n_name", "n_regionkey")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("s_suppkey"), cand_html.alias("c")))
            ).alias("cands")
        )
        .select(
            "n_nationkey",
            "n_regionkey",
            F.concat(
                F.lit('<div class="position" data-nation="'), F.col("n_name"),
                F.lit('">'),
                F.array_join(F.transform(F.col("cands"), lambda c: c["c"]), ""),
                F.lit("</div>"),
            ).alias("pos"),
        )
    )
    pages = (
        nations.join(F.broadcast(reg), nations["n_regionkey"] == reg["r_regionkey"])
        .groupBy("r_regionkey", "r_name")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("n_nationkey"), F.col("pos")))
            ).alias("positions")
        )
        .select(
            F.col("r_regionkey").alias("page"),
            F.concat(
                F.lit('<html><body><div class="group" data-region="'),
                F.col("r_name"),
                F.lit('">'),
                F.array_join(F.transform(F.col("positions"), lambda p: p["pos"]), ""),
                F.lit("</div></body></html>"),
            ).alias("html"),
        )
    )
    records = extract_records(pages.repartition(5, "page"), parser="nested")
    flat = stabilize_columns(records, keys=["region", "nation", "name", "acctbal"])
    return flat.select("region", "nation", "name", "acctbal")


# ---------------------------------------------------------------------------
# S2+S10+P9: landing-zone scan — real files on disk read through
# binaryFile with pathGlobFilter pushdown (P9: the .txt decoys are pruned
# at file listing) and a partition column extracted from the file path
# (S10). Content is generated deterministically from the file index, so
# the DuckDB oracle reproduces the expected records from range() alone.
# Reference: templates/template_extract.py:76-84 (landing-dir re-extract).
# ---------------------------------------------------------------------------

_LANDING_STATES = ["TX", "CA", "NY", "WA"]
_N_PAGES = 20


def _landing_dir(spark: SparkSession) -> str:
    """Create the fixture landing dir once per host (idempotent)."""
    import os

    d = "/root/repo/.landing_demo"
    # Version the fixture by its generating constants: editing the page
    # count or state cycle invalidates the cache instead of silently
    # serving stale files against a freshly built oracle.
    done = os.path.join(d, ".complete")
    version = f"{_N_PAGES}:{','.join(_LANDING_STATES)}"
    stale = True
    if os.path.exists(done):
        with open(done) as f:
            stale = f.read() != version
    if stale:
        os.makedirs(d, exist_ok=True)
        for i in range(_N_PAGES):
            state = _LANDING_STATES[i % len(_LANDING_STATES)]
            rows = "".join(
                f"<tr><td>{i}-{j}</td><td>{i * 100 + j}</td></tr>"
                for j in range(1 + i % 3)
            )
            html = (
                "<html><body><table><thead><tr><th>k</th><th>v</th></tr>"
                f"</thead><tbody>{rows}</tbody></table></body></html>"
            )
            with open(os.path.join(d, f"page_{state}_{i}.html"), "w") as f:
                f.write(html)
            # P9 decoys: same stem, wrong extension - must be pruned by glob
            with open(os.path.join(d, f"page_{state}_{i}.txt"), "w") as f:
                f.write("not html")
        with open(done, "w") as f:
            f.write(version)
    # Deterministic mtimes (base + page index) so O1's most-recent-first
    # ordering is reproducible; re-applied every call because filesystem
    # copies / checkouts don't preserve them.
    base = 1_700_000_000
    for i in range(_N_PAGES):
        state = _LANDING_STATES[i % len(_LANDING_STATES)]
        os.utime(os.path.join(d, f"page_{state}_{i}.html"), (base + i, base + i))
    return d


_LANDING_ORACLE = f"""
WITH pages AS (SELECT i FROM range({_N_PAGES}) t(i)),
rows_ AS (
  SELECT i, j FROM pages CROSS JOIN range(3) t2(j) WHERE j < 1 + i % 3
)
SELECT ({"[" + ",".join("'" + s + "'" for s in _LANDING_STATES) + "]"})
         [CAST(i % {len(_LANDING_STATES)} AS INTEGER) + 1] AS state,
       CAST(i AS VARCHAR) || '-' || CAST(j AS VARCHAR) AS k,
       CAST(i * 100 + j AS VARCHAR) AS v
FROM rows_
"""


@register(
    "extract_s2_landing_scan",
    oracle=_LANDING_ORACLE,
    doc="S2+S10+P9: binaryFile landing scan with glob pushdown and"
        " path-derived partition column",
)
def extract_s2_landing_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sig_etl_spark.extract import read_landing

    d = _landing_dir(spark)
    landed = read_landing(spark, d, glob="*.html")
    records = extract_records(
        landed, parser="table", partition_pattern=r"page_([A-Z]{2})_\d+\.html"
    )
    flat = stabilize_columns(records, keys=["k", "v"])
    return flat.select(F.col("partition").alias("state"), "k", "v")


# ---------------------------------------------------------------------------
# K1+S15: CSV stage round-trip — write a derived frame through the CSV
# sink (nulls as literal 'nan'), re-enter it with the stage reader, and
# return the recovered records. The oracle recomputes the same derivation
# directly; any sink/reader defect (quoting, header, NaN policy, empty
# strings) breaks the hash.
# Reference: templates/template_script.py:161-183.
# ---------------------------------------------------------------------------


@register(
    "csv_stage_roundtrip",
    oracle="""
    SELECT CAST(p_partkey AS VARCHAR) AS pk,
           CASE WHEN p_partkey % 7 = 0 THEN NULL ELSE p_name END AS name,
           CASE WHEN p_partkey % 5 = 0 THEN '' ELSE p_brand END AS brand
    FROM part
    """,
    doc="K1+S15: CSV sink + stage re-entry preserving the nan/empty policy",
)
def csv_stage_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sig_etl_spark.sources import read_stage_csv, write_stage_csv

    part = load_table(spark, sf_dir, "part")
    staged = part.select(
        F.col("p_partkey").cast("string").alias("pk"),
        F.when(F.col("p_partkey") % 7 != 0, F.col("p_name")).alias("name"),
        F.when(F.col("p_partkey") % 5 == 0, F.lit("")).otherwise(
            F.col("p_brand")
        ).alias("brand"),
    )
    d = "/root/repo/.stage_demo"
    write_stage_csv(staged, d)
    return read_stage_csv(spark, d)


# ---------------------------------------------------------------------------
# S12: JDBC source round-trip (round 14 — VERDICT r13 task 1). The
# parquet-only oracle harness cannot see an external database, so —
# exactly like the WARC queries build their containers in-engine — this
# query LOADS the candidate dimension into an embedded Derby database
# (the JDBC driver Spark ships for its Hive metastore: a real network-
# protocol-free RDBMS, not a mock), then reads it back through
# spark.read.jdbc with (a) a WHERE predicate baked into the pushed-down
# query string, so the DATABASE does the filtering the way the
# reference's `= ANY(%(list)s)` params do, and (b) a 4-way partitioned
# read on the integer key, the parallel-scan shape a real warehouse
# extract uses. The oracle applies the same predicate to the parquet
# directly — any defect in type mapping (BIGINT/INTEGER/DOUBLE/VARCHAR),
# identifier quoting, predicate rendering, partition-bound generation,
# or null round-trip breaks the value hash.
# Reference: votervoice/match.py:22-35 (candidates-from-Postgres
# dimension query), queries/office_list.sql (the pushed-down SQL).
# 100 TB story: the JDBC side is a DIMENSION source (the reference's
# candidate/office tables) — bounded-size by nature; the partitioned
# read parallelizes extraction and every predicate ships to the DB, so
# Spark never scans more of the dimension than the query needs.
# ---------------------------------------------------------------------------

_JDBC_SEGMENTS = ["BUILDING", "AUTOMOBILE"]

_JDBC_ORACLE = f"""
SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
FROM customer
WHERE c_mktsegment IN ({", ".join("'" + s + "'" for s in _JDBC_SEGMENTS)})
"""


_JDBC_STAGE_CLEANUP = [False]


def _jdbc_stage_dir() -> str:
    """Pid-keyed Derby staging directory: reap dead-pid siblings, remove
    this process's own dir at exit (ADVICE r14 leak fix)."""
    import atexit
    import shutil
    import tempfile

    base = tempfile.gettempdir()
    try:
        names = os.listdir(base)
    except OSError:
        names = []
    for name in names:
        if not name.startswith("sig_etl_stage_jdbc_"):
            continue
        try:
            pid = int(name.rsplit("_", 1)[-1])
        except ValueError:
            continue
        if pid == os.getpid():
            continue
        try:
            os.kill(pid, 0)  # liveness probe only
        except ProcessLookupError:
            shutil.rmtree(os.path.join(base, name), ignore_errors=True)
        except PermissionError:
            pass  # alive under another uid — not ours to reap
    d = os.path.join(base, f"sig_etl_stage_jdbc_{os.getpid()}")
    if not _JDBC_STAGE_CLEANUP[0]:
        atexit.register(shutil.rmtree, d, ignore_errors=True)
        _JDBC_STAGE_CLEANUP[0] = True
    return d



@register(
    "jdbc_stage_roundtrip",
    oracle=_JDBC_ORACLE,
    doc="S12: load the customer dimension into embedded Derby in-engine,"
        " read it back via spark.read.jdbc with a pushed-down IN"
        " predicate + 4-way partitioned read on the integer key"
        " (votervoice/match.py:22-35, queries/office_list.sql)",
)
def jdbc_stage_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sig_etl_spark.sources import jdbc_query, render_any_list

    dim = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"
    )
    # Bounds for the partitioned read: one 1-row agg collect over the
    # dimension — constant-size driver traffic, the same discovery a
    # real extract does with SELECT min(k), max(k).
    lo, hi = dim.agg(F.min("c_custkey"), F.max("c_custkey")).first()
    # Embedded Derby allows exactly one JVM per database directory
    # (db.lck): a fixed path makes two concurrent harness processes
    # (bench + verify + pytest smoke) collide on boot. The staging
    # database is incidental — only the round-tripped rows matter — so
    # key the directory by pid: stable within a process (overwrite mode
    # reuses it across invocations), disjoint across processes. The dir
    # is removed at interpreter exit, and stale dirs of DEAD pids are
    # reaped on entry (round 15 — ADVICE r14: a recycled pid could
    # otherwise inherit a crashed JVM's db.lck, which Derby refuses to
    # boot over; live pids under another uid are left alone).
    stage_dir = _jdbc_stage_dir()
    url = f"jdbc:derby:{stage_dir}/stagedb;create=true"
    props = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}
    # Spark's DerbyDialect maps StringType to CLOB, which Derby refuses
    # to compare in WHERE — force VARCHAR so the predicate can push down.
    (
        dim.write.mode("overwrite")
        .option(
            "createTableColumnTypes",
            "c_name VARCHAR(64), c_mktsegment VARCHAR(16)",
        )
        .jdbc(url, "candidates", properties=props)
    )
    # Spark quotes the written identifiers (case-preserved), so the
    # pushed-down query and the partition column must quote them too.
    pred = render_any_list('"c_mktsegment"', _JDBC_SEGMENTS)
    out = jdbc_query(
        spark,
        url,
        f'SELECT "c_custkey", "c_name", "c_nationkey", "c_acctbal",'
        f' "c_mktsegment" FROM candidates WHERE {pred}',
        properties=props,
        partition_column='"c_custkey"',
        num_partitions=4,
        lower_bound=int(lo),
        upper_bound=int(hi) + 1,
    )
    return out.select(
        F.col("c_custkey").cast("bigint").alias("c_custkey"),
        "c_name",
        F.col("c_nationkey").cast("int").alias("c_nationkey"),
        F.col("c_acctbal").cast("double").alias("c_acctbal"),
        "c_mktsegment",
    )


# ---------------------------------------------------------------------------
# O1+P4: newest-batch re-extract with positional slice — the reference
# sorts the landing dir by ctime, re-extracts only the newest files, and
# drops the first parsed row of each page positionally (header rows that
# survive the parser). Fixture mtimes are pinned to base+i, so "the 8
# newest pages" is exactly i in [12, 20).
# Reference: templates/template_extract.py:76-84 (ctime sort),
# national/_1034/extract.py (rows[1:] slice).
# ---------------------------------------------------------------------------

_N_LATEST = 8

_LATEST_ORACLE = f"""
WITH pages AS (
  SELECT i FROM range({_N_PAGES}) t(i) WHERE i >= {_N_PAGES - _N_LATEST}
),
rows_ AS (
  SELECT i, j FROM pages CROSS JOIN range(3) t2(j)
  WHERE j >= 1 AND j < 1 + i % 3
)
SELECT ({"[" + ",".join("'" + s + "'" for s in _LANDING_STATES) + "]"})
         [CAST(i % {len(_LANDING_STATES)} AS INTEGER) + 1] AS state,
       CAST(i AS VARCHAR) || '-' || CAST(j AS VARCHAR) AS k,
       CAST(i * 100 + j AS VARCHAR) AS v
FROM rows_
"""


@register(
    "extract_o1_latest_slice",
    oracle=_LATEST_ORACLE,
    doc="O1+P4: mtime-ranked newest-batch scan, then positional record"
        " slice (drop row 0 per page)",
)
def extract_o1_latest_slice(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sig_etl_spark.extract import latest_files, read_landing, slice_records

    d = _landing_dir(spark)
    landed = read_landing(spark, d, glob="*.html")
    newest = latest_files(landed, _N_LATEST)
    records = extract_records(
        newest, parser="table", partition_pattern=r"page_([A-Z]{2})_\d+\.html"
    )
    sliced = slice_records(records, start=1)
    flat = stabilize_columns(sliced, keys=["k", "v"])
    return flat.select(F.col("partition").alias("state"), "k", "v")


# ---------------------------------------------------------------------------
# S14+J9: Excel-driven dim join — an xlsx driver table (parsed with the
# stdlib reader, dtype=str semantics) broadcast-joined against fact rows,
# exactly how the reference drives a group's scan off a spreadsheet.
# Reference: national/_2155/__main__.py:119-120 (pandas.read_excel dim).
# ---------------------------------------------------------------------------

_XLSX_STATES = ["TX", "CA", "NY", "WA", "IL", "MA", "GA", "OH"]
_XLSX_ZIPS = [str(75000 + i) for i in range(10)]  # last two not in the dim


def _excel_dim(spark: SparkSession):
    import os

    from sig_etl_spark.sources import read_excel, write_xlsx

    d = "/root/repo/.excel_demo"
    path = os.path.join(d, "dim.xlsx")
    # Rewritten unconditionally: the file is dim-sized and written on the
    # driver, and an unconditional write can never serve a stale fixture
    # after the _XLSX_* constants (and thus the oracle SQL) change.
    os.makedirs(d, exist_ok=True)
    write_xlsx(
        path,
        ["zip", "state_id"],
        [[_XLSX_ZIPS[i], s] for i, s in enumerate(_XLSX_STATES)],
    )
    return read_excel(spark, path)


_EXCEL_ORACLE = f"""
WITH dim(zip, state_id) AS (VALUES
  {", ".join(f"('{_XLSX_ZIPS[i]}', '{s}')" for i, s in enumerate(_XLSX_STATES))}
),
cust AS (
  SELECT c_name,
         ({"[" + ",".join("'" + z + "'" for z in _XLSX_ZIPS) + "]"})
           [CAST(c_custkey % {len(_XLSX_ZIPS)} AS INTEGER) + 1] AS zip
  FROM customer
)
SELECT state_id,
       CAST(COUNT(*) AS BIGINT) AS n_cust,
       MIN(c_name) AS first_name
FROM cust JOIN dim USING (zip)
GROUP BY state_id
"""


@register(
    "excel_dim_join",
    oracle=_EXCEL_ORACLE,
    doc="S14+J9: stdlib-parsed xlsx dim broadcast-joined to customers;"
        " unknown zips fall out on the inner join",
)
def excel_dim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    dim = _excel_dim(spark)
    cust = load_table(spark, sf_dir, "customer").select(
        "c_name",
        F.try_element_at(
            F.array(*[F.lit(z) for z in _XLSX_ZIPS]),
            (F.col("c_custkey") % len(_XLSX_ZIPS)).cast("int") + 1,
        ).alias("zip"),
    )
    return (
        cust.join(F.broadcast(dim), "zip")
        .groupBy("state_id")
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            F.min("c_name").alias("first_name"),
        )
    )


# ---------------------------------------------------------------------------
# S15-family: JSONL stage round-trip with a NESTED payload — the
# interchange format the CSV stage can't carry. Records are written as
# line-delimited JSON with a nested meta struct, re-read with an
# EXPLICIT schema (schema-on-read, no inference pass at scale) and
# flattened back. The oracle re-derives the same rows from the events
# table directly, so the hash proves the sink+source pair is lossless —
# including the double column, which Spark serializes at full precision
# (shortest-round-trip repr) so text->double returns the identical bits.
# ---------------------------------------------------------------------------


@register(
    "jsonl_stage_roundtrip",
    oracle="""
    SELECT event_id, event_type,
           user_id, CAST(date_diff('day', DATE '1970-01-01',
                          CAST(date_trunc('day', ts) AS DATE)) AS BIGINT) AS dayno,
           value
    FROM events
    """,
    doc="JSONL sink + schema-on-read source with a nested struct,"
        " lossless round-trip incl. full-precision doubles",
)
def jsonl_stage_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    ev = load_table(spark, sf_dir, "events")
    staged = ev.select(
        "event_id",
        "event_type",
        F.struct(
            F.col("user_id"),
            F.datediff(F.date_trunc("day", F.col("ts")), F.lit("1970-01-01"))
            .cast("bigint")
            .alias("dayno"),
        ).alias("meta"),
        "value",
    )
    # Stage dir keyed by sf_dir (same discipline as parquet_schema_evolution)
    # so interleaved verify (sf0.01) and bench (sf0.1) runs — or a lazily
    # re-evaluated returned DataFrame — never read the other scale's data.
    tag = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:8]
    d = f"/root/repo/.jsonl_stage_demo_{tag}"
    staged.write.mode("overwrite").json(d)
    schema = StructType(
        [
            StructField("event_id", LongType()),
            StructField("event_type", StringType()),
            StructField(
                "meta",
                StructType(
                    [
                        StructField("user_id", LongType()),
                        StructField("dayno", LongType()),
                    ]
                ),
            ),
            StructField("value", DoubleType()),
        ]
    )
    back = spark.read.schema(schema).json(d)
    return back.select(
        "event_id",
        "event_type",
        F.col("meta.user_id").alias("user_id"),
        F.col("meta.dayno").alias("dayno"),
        "value",
    )


# ---------------------------------------------------------------------------
# Parquet schema evolution: two staged batches written with DIFFERENT
# schemas (the second adds a column — the standard additive evolution a
# landing zone accumulates), read back as ONE frame via mergeSchema.
# Spark unifies the footers and back-fills the missing column with
# nulls; the oracle re-derives the identical union from the source
# table, so the hash proves the merged read is exactly
# "old rows with null new-columns" — no silent drop, no type clash.
# Scale note: mergeSchema is a footer-only operation (no data rewrite);
# the per-file cost at 100 TB is bounded by file COUNT, which is why
# the layout job compacts small files first.
# ---------------------------------------------------------------------------


@register(
    "parquet_schema_evolution",
    oracle="""
    SELECT o_orderkey,
           CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents,
           CASE WHEN o_orderkey % 2 = 1 THEN o_orderpriority END AS priority,
           CASE WHEN o_orderkey % 2 = 0 THEN 'v1' ELSE 'v2' END AS batch
    FROM orders
    """,
    doc="additive parquet schema evolution: two-schema landing dir read"
        " as one frame via mergeSchema, nulls back-filled — oracle"
        " proves no row or column is silently dropped",
)
def parquet_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    import hashlib
    import os

    o = load_table(spark, sf_dir, "orders")
    v1 = o.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    v2 = o.filter(F.col("o_orderkey") % 2 == 1).select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
        F.col("o_orderpriority").alias("priority"),
    )
    tag = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:8]
    d = f"/root/repo/.schema_evo_demo/{tag}"
    v1.write.mode("overwrite").parquet(os.path.join(d, "batch=v1"))
    v2.write.mode("overwrite").parquet(os.path.join(d, "batch=v2"))
    return spark.read.option("mergeSchema", "true").option(
        "basePath", d
    ).parquet(os.path.join(d, "batch=v1"), os.path.join(d, "batch=v2"))


# ---------------------------------------------------------------------------
# K1+S15 (ORC): columnar stage round-trip through Spark's native ORC
# source — the third stage format next to CSV and JSONL, exercising a
# TYPED round-trip (bigint/nullable-string survive the sink unchanged,
# no string re-parsing on re-entry). The oracle recomputes the staged
# derivation directly; a type or null-policy defect in the sink/reader
# breaks schema or hash.
# ---------------------------------------------------------------------------


@register(
    "orc_stage_roundtrip",
    oracle="""
    SELECT p_partkey AS pk,
           CASE WHEN p_partkey % 7 = 0 THEN NULL ELSE p_name END AS name,
           CAST(ROUND(p_retailprice * 100) AS BIGINT) AS price_cents
    FROM part
    """,
    doc="K1+S15: typed ORC stage sink + re-entry (bigint and nullable"
        " string survive unchanged — no string re-parsing)",
)
def orc_stage_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    staged = part.select(
        F.col("p_partkey").alias("pk"),
        F.when(F.col("p_partkey") % 7 != 0, F.col("p_name")).alias("name"),
        F.round(F.col("p_retailprice") * 100)
        .cast("bigint")
        .alias("price_cents"),
    )
    d = "/root/repo/.stage_demo_orc"
    staged.write.mode("overwrite").orc(d)
    return spark.read.orc(d)


# ---------------------------------------------------------------------------
# Corrupt-record tolerance (round 7): the ingestion property a 100 TB
# landing zone lives or dies by — malformed lines must neither kill the
# scan NOR silently swallow good rows. The stage plants a deterministic
# corruption (every event_id % 37 == 0 writes a TRUNCATED JSON line);
# the PERMISSIVE schema-on-read scan then yields all-null fields for
# exactly those lines. The oracle re-derives the intended split from
# the source table, so the hash proves three things at once: every
# good line survived (per-type counts), every planted corruption was
# quarantined (the '_corrupt' row), and payloads are bit-intact
# (integer-cent sums per type — a count-only check would miss a parser
# that mangles values). Spark 4 drops unparseable lines outright when
# the schema has no corrupt-record column, so the quarantine count is
# derived scan-side as total text lines minus JSON survivors (see the
# in-function comment) — never via columnNameOfCorruptRecord, which is
# only legal behind a cache.
# ---------------------------------------------------------------------------

_CORRUPT_EVERY = 37

_CORRUPT_ORACLE = f"""
WITH staged AS (
  SELECT event_id, event_type,
         CAST(ROUND(value * 100) AS BIGINT) AS cents,
         (event_id % {_CORRUPT_EVERY} = 0) AS is_bad
  FROM events
)
SELECT event_type, COUNT(*) AS n_rows,
       CAST(SUM(cents) AS BIGINT) AS cents_sum
FROM staged WHERE NOT is_bad GROUP BY event_type
UNION ALL
SELECT '_corrupt', COUNT(*), CAST(0 AS BIGINT)
FROM staged WHERE is_bad
ORDER BY event_type
"""


@register(
    "jsonl_corrupt_tolerance",
    oracle=_CORRUPT_ORACLE,
    doc="PERMISSIVE schema-on-read over a JSONL stage with planted"
        " truncated lines: per-type survivor counts + integer-cent"
        " payload sums + the quarantined-corrupt row — proves no good"
        " row lost, every corruption caught, payloads intact",
)
def jsonl_corrupt_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    ev = load_table(spark, sf_dir, "events")
    line = F.when(
        F.col("event_id") % _CORRUPT_EVERY == 0,
        # truncated mid-key: unparseable by any JSON reader
        F.concat(F.lit('{"event_id": '), F.col("event_id"), F.lit(', "event_')),
    ).otherwise(
        F.to_json(
            F.struct(
                F.col("event_id"),
                F.col("event_type"),
                F.round(F.col("value") * 100).cast("bigint").alias("cents"),
            )
        )
    )
    tag = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:8]
    d = f"/root/repo/.jsonl_corrupt_demo_{tag}"
    ev.select(line.alias("value")).write.mode("overwrite").text(d)

    schema = StructType(
        [
            StructField("event_id", LongType()),
            StructField("event_type", StringType()),
            StructField("cents", LongType()),
        ]
    )
    # Spark 4 DROPS unparseable lines when the schema carries no
    # corrupt-record column (and filtering on that column is only legal
    # behind a cache — a non-starter for a 100 TB scan). The scalable
    # accounting: a raw text read counts total lines, the JSON read
    # counts survivors, and the quarantine row is the difference — two
    # 1-row aggregates, no cache, each read a plain scan.
    back = spark.read.schema(schema).option("mode", "PERMISSIVE").json(d)
    good = (
        back.filter(F.col("event_id").isNotNull())
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("cents").cast("bigint").alias("cents_sum"),
        )
    )
    n_total = spark.read.text(d).agg(F.count(F.lit(1)).alias("n_total"))
    n_good = good.agg(F.sum("n_rows").alias("n_good"))
    corrupt = (
        n_total.crossJoin(F.broadcast(n_good))
        .select(
            F.lit("_corrupt").alias("event_type"),
            (F.col("n_total") - F.col("n_good")).cast("bigint").alias("n_rows"),
            F.lit(0).cast("bigint").alias("cents_sum"),
        )
    )
    return good.unionByName(corrupt).orderBy("event_type")


# ---------------------------------------------------------------------------
# WARC container roundtrip (round 9 — VERDICT r8 task 6): documents are
# rendered IN-ENGINE into per-record-gzipped WARC containers (the
# .warc.gz Common Crawl shape, stdlib zlib, deterministic members), then
# the real gzip-member walker + WARC header parser recovers every
# record. The oracle selects the same fields directly from documents —
# any defect in member framing, header parsing, Content-Length
# accounting, or utf-8 payload round-trip breaks the value hash.
# extract/warc.py:read_warc_zone is the production binaryFile entry over
# a real landing directory (pytest-covered with a written fixture).
# ---------------------------------------------------------------------------

_N_WARC_CONTAINERS = 8

_WARC_ORACLE = f"""
SELECT CAST(doc_id % {_N_WARC_CONTAINERS} AS BIGINT) AS container_id,
       doc_id,
       'https://example.org/docs/' || CAST(doc_id AS VARCHAR) AS target_uri,
       'response' AS warc_type,
       CAST(octet_length(encode(text)) AS BIGINT) AS content_length,
       text AS payload
FROM documents
"""


@register(
    "extract_warc_records",
    oracle=_WARC_ORACLE,
    doc="WARC-style container ingestion: render documents into"
        " per-record-gzip WARC containers, walk members with the stdlib"
        " zlib walker, parse headers + Content-Length payloads back out"
        " (extract/warc.py; production entry = binaryFile read_warc_zone)",
)
def extract_warc_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sig_etl_spark.extract import warc

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    # Explicit-count repartition for the same reason extract_s3_roundtrip
    # documents: AQE would coalesce the tiny rendered-container shuffle to
    # 1-2 partitions and serialize the Python walker; real landing zones
    # get one task per container file from binaryFile for free.
    containers = warc.render_containers(
        docs, n_containers=_N_WARC_CONTAINERS
    ).repartition(_N_WARC_CONTAINERS, "container_id")
    return warc.parse_containers(containers)


# ---------------------------------------------------------------------------
# WARC -> WET composition (round 10 — VERDICT r9 task 2): crawl
# containers to parsed text records, the actual Common Crawl WET step.
# Records now have the REAL crawl shape — WARC-Type: response with
# Content-Type: application/http, payload = full HTTP/1.1 response whose
# body is an HTML page — and the extraction chain is
#   gzip-member walk -> WARC header parse (extract/warc.py)
#   -> HTTP header strip (pure column algebra, warc.http_body)
#   -> the SAME S3 HTML-table parse UDF the reference family uses
#      (extract/parse.py:20, reference templates/template_extract.py:24-32)
# so every stage of a real crawl-to-text pipeline runs in one plan. The
# oracle selects the same fields straight from documents: any defect in
# member framing, WARC parsing, HTTP splitting, or HTML table recovery
# breaks the value hash.
# ---------------------------------------------------------------------------

_WET_ORACLE = """
SELECT doc_id,
       'https://example.org/docs/' || CAST(doc_id AS VARCHAR) AS target_uri,
       lang, source, text
FROM documents
"""


@register(
    "extract_warc_wet",
    oracle=_WET_ORACLE,
    doc="WARC->WET: render documents as HTTP-response crawl records in"
        " gzip-member containers, then recover text via the full chain —"
        " member walk, WARC parse, JVM-side HTTP header strip"
        " (warc.http_body), S3 HTML-table parse UDF — one plan from"
        " container bytes to text records",
)
def extract_warc_wet(spark: SparkSession, sf_dir: str) -> DataFrame:
    return wet_text_records(spark, sf_dir)


def _html_escape(col):
    """JVM-side minimal HTML escape for text embedded into rendered
    markup cells: & first (never re-escapes the entities it just made),
    then the angle brackets. The inverse is the parse side's stdlib
    ``HTMLParser(convert_charrefs=True)`` entity decoding
    (extract/html_mini.py:62), which closes the markup-injection class:
    document text containing '</td>', '<' or '&' can no longer corrupt
    the table-parse recovery. Scope honesty: the round-trip is exact for
    SINGLE-SPACED text only — html_mini's Node.text() collapses
    whitespace runs and strips ends (' '.join/.split), so a tab, double
    space, or leading/trailing whitespace in a cell would still diverge.
    The driver fixtures are single-spaced (and the oracle hash would
    catch a regression of that assumption the round it broke)."""
    out = col
    for raw, ent in (("&", "&amp;"), ("<", "&lt;"), (">", "&gt;")):
        out = F.replace(out, F.lit(raw), F.lit(ent))
    return out


def wet_from_records(recs: DataFrame) -> DataFrame:
    """WET text recovery from parsed WARC records — the back half of the
    WARC->WET chain, batch AND stream safe (http_body is pure column
    algebra, the S3 table parse is an Arrow mapInPandas pass, and
    stabilize_columns runs with EXPLICIT keys so no discovery scan
    touches the stream). Input: (doc_id, target_uri, payload, ...) as
    produced by warc.parse_containers / read_warc_stream."""
    from sig_etl_spark.extract import extract_records, stabilize_columns, warc

    pages = recs.select(
        "doc_id", "target_uri", warc.http_body(F.col("payload")).alias("html")
    )
    parsed = extract_records(pages, parser="table")
    flat = stabilize_columns(parsed, keys=["lang", "source", "body"])
    return flat.select(
        "doc_id", "target_uri", "lang", "source", F.col("body").alias("text")
    )


def wet_crawl_containers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The render half of the WARC->WET chain: documents as
    HTTP-response crawl records in gzip-member containers —
    (container_id, data). Shared by wet_text_records (parses in-engine)
    and the streaming capstone test (writes the SAME bytes to a landing
    zone so the stream ingests bit-identical containers)."""
    from sig_etl_spark.extract import warc

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source"
    )
    # HTML page + HTTP envelope rendered JVM-side (codegen'd concat) —
    # the Python step only ever sees opaque payload strings. Embedded
    # cells are entity-escaped; the S3 parse UDF's convert_charrefs
    # decode inverts the escapes, so the oracle hash proves an exact
    # text round-trip for the fixtures' single-spaced text (whitespace
    # runs would not survive Node.text() — see _html_escape's docstring).
    page = F.concat(
        F.lit("<html><head><title>doc "),
        F.col("doc_id").cast("string"),
        F.lit(
            "</title></head><body><table><thead><tr><th>lang</th>"
            "<th>source</th><th>body</th></tr></thead><tbody><tr><td>"
        ),
        _html_escape(F.col("lang")),
        F.lit("</td><td>"),
        _html_escape(F.col("source")),
        F.lit("</td><td>"),
        _html_escape(F.col("text")),
        F.lit("</td></tr></tbody></table></body></html>"),
    )
    http = F.concat(
        F.lit("HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n"
              "Content-Length: "),
        F.octet_length(page).cast("string"),
        F.lit("\r\n\r\n"),
        page,
    )
    return warc.render_containers(
        docs.select("doc_id", http.alias("text")),
        n_containers=_N_WARC_CONTAINERS,
        content_type="application/http; msgtype=response",
    ).repartition(_N_WARC_CONTAINERS, "container_id")


def wet_text_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The WARC->WET chain as a reusable frame (also the front end of the
    crawl-curation capstone llm_crawl_curation_e2e): (doc_id, target_uri,
    lang, source, text) recovered from rendered crawl containers."""
    from sig_etl_spark.extract import warc

    return wet_from_records(
        warc.parse_containers(wet_crawl_containers(spark, sf_dir))
    )
