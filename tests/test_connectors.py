"""Formerly env-gated connectors, un-gated on stdlib: the XLSX scan
(zipfile+ElementTree SpreadsheetML parser — no openpyxl) and the
partitioned SQL-database read/write (DB-API over sqlite3 — the JDBC
capability: range slices, pushdown, per-partition appends)."""

from __future__ import annotations

import sqlite3
import zipfile

from pyspark.sql import functions as F

from pwc_challenge_dataengineer_spark.sources.dbapi import (
    range_predicates,
    read_sql_partitioned,
    write_sql_append,
)
from pwc_challenge_dataengineer_spark.sources.readers import read_excel
from pwc_challenge_dataengineer_spark.sources.xlsx import read_excel_dir

_SST = """<?xml version="1.0"?>
<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="3" uniqueCount="3">
<si><t>name</t></si><si><t>qty</t></si><si><t>widget</t></si></sst>"""

_WB = """<?xml version="1.0"?>
<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"
 xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
<sheets><sheet name="Data" sheetId="1" r:id="rId1"/></sheets></workbook>"""

_RELS = """<?xml version="1.0"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Target="worksheets/sheet1.xml"
 Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet"/></Relationships>"""


def _sheet(rows_xml: str) -> str:
    return (
        '<?xml version="1.0"?><worksheet '
        'xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        f"<sheetData>{rows_xml}</sheetData></worksheet>"
    )


def _write_xlsx(path, price: float, qty: int) -> None:
    # header via shared strings; data row mixes shared-string, inline
    # number, and a sparse reference (C skipped then D) like real writers
    rows = (
        '<row r="1">'
        '<c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c>'
        '<c r="C1" t="inlineStr"><is><t>price</t></is></c>'
        "</row>"
        '<row r="2">'
        f'<c r="A2" t="s"><v>2</v></c><c r="B2"><v>{qty}</v></c>'
        f'<c r="C2"><v>{price}</v></c>'
        "</row>"
    )
    with zipfile.ZipFile(path, "w") as zf:
        zf.writestr("xl/workbook.xml", _WB)
        zf.writestr("xl/_rels/workbook.xml.rels", _RELS)
        zf.writestr("xl/sharedStrings.xml", _SST)
        zf.writestr("xl/worksheets/sheet1.xml", _sheet(rows))


def test_xlsx_single_workbook(spark, tmp_path):
    p = tmp_path / "book.xlsx"
    _write_xlsx(p, price=9.75, qty=3)
    df = read_excel(spark, str(p))
    assert df.columns == ["name", "qty", "price"]
    assert dict(df.dtypes) == {"name": "string", "qty": "bigint", "price": "double"}
    row = df.collect()[0]
    assert (row["name"], row["qty"], row["price"]) == ("widget", 3, 9.75)


def test_xlsx_directory_parses_on_executors(spark, tmp_path):
    d = tmp_path / "dropzone"
    d.mkdir()
    for i in range(4):
        _write_xlsx(d / f"b{i}.xlsx", price=1.5 * (i + 1), qty=i)
    df = read_excel_dir(spark, str(d))
    rows = df.collect()
    assert len(rows) == 4
    assert {r["qty"] for r in rows} == {0, 1, 2, 3}
    assert all(r["_source_file"].endswith(".xlsx") for r in rows)


def _make_db(path, n=1000) -> None:
    con = sqlite3.connect(path)
    con.execute("CREATE TABLE t (id INTEGER, grp TEXT, amount REAL)")
    con.executemany(
        "INSERT INTO t VALUES (?, ?, ?)",
        [(i, f"g{i % 7}", i * 1.25) for i in range(n)],
    )
    con.commit()
    con.close()


def test_jdbc_style_partition_predicates_cover_exactly_once():
    preds = range_predicates("id", 0, 100, 4)
    assert preds[0] == "id < 25"
    assert preds[-1] == "id >= 75"
    # every value inside AND OUTSIDE the bounds matches exactly one slice
    for v in (-5, 0, 24, 25, 60, 99, 100, 10_000):
        assert sum(eval(p.replace("id", str(v)).replace("AND", "and")) for p in preds) == 1


def test_sql_partitioned_read_matches_full_table(spark, tmp_path):
    db = str(tmp_path / "db.sqlite")
    _make_db(db)
    df = read_sql_partitioned(
        spark, db, "t", partition_column="id",
        lower_bound=0, upper_bound=1000, num_partitions=4,
    )
    assert df.count() == 1000
    agg = df.agg(F.sum("id").alias("s"), F.sum("amount").alias("a")).first()
    assert agg["s"] == sum(range(1000))
    assert abs(agg["a"] - sum(i * 1.25 for i in range(1000))) < 1e-6


def test_sql_read_pushdown_predicate(spark, tmp_path):
    db = str(tmp_path / "db.sqlite")
    _make_db(db)
    df = read_sql_partitioned(
        spark, db, "t", partition_column="id",
        lower_bound=0, upper_bound=1000, num_partitions=3,
        predicate="grp = 'g3'",
    )
    rows = df.collect()
    assert len(rows) == len([i for i in range(1000) if i % 7 == 3])
    assert all(r["grp"] == "g3" for r in rows)


def test_sql_append_sink_roundtrip(spark, tmp_path):
    db = str(tmp_path / "db.sqlite")
    con = sqlite3.connect(db)
    con.execute("CREATE TABLE sink (k INTEGER, v TEXT)")
    con.commit()
    con.close()
    df = spark.createDataFrame(
        [(i, f"v{i}") for i in range(200)], "k BIGINT, v STRING"
    ).repartition(4)
    write_sql_append(df, db, "sink")
    back = read_sql_partitioned(spark, db, "sink")
    assert back.count() == 200
    assert back.agg(F.sum("k")).first()[0] == sum(range(200))


def test_xlsx_missing_sheet_raises(spark, tmp_path):
    import pytest

    p = tmp_path / "book.xlsx"
    _write_xlsx(p, price=1.0, qty=1)
    with pytest.raises(ValueError, match="not found"):
        read_excel(spark, str(p), sheet_name="NoSuchSheet")


def test_xlsx_comma_in_header(spark, tmp_path):
    # header cells with commas must survive schema construction
    rows = (
        '<row r="1"><c r="A1" t="inlineStr"><is><t>Revenue, net</t></is></c>'
        '<c r="B1" t="inlineStr"><is><t>qty</t></is></c></row>'
        '<row r="2"><c r="A2"><v>9.5</v></c><c r="B2"><v>2</v></c></row>'
    )
    p = tmp_path / "c.xlsx"
    with zipfile.ZipFile(p, "w") as zf:
        zf.writestr("xl/workbook.xml", _WB)
        zf.writestr("xl/_rels/workbook.xml.rels", _RELS)
        zf.writestr("xl/worksheets/sheet1.xml", _sheet(rows))
    df = read_excel(spark, str(p))
    assert df.columns == ["Revenue, net", "qty"]
    r = df.collect()[0]
    assert (r["Revenue, net"], r["qty"]) == (9.5, 2)


def test_sql_probe_survives_leading_nulls(spark, tmp_path):
    # a numeric column whose FIRST rows are NULL must still type numeric
    db = str(tmp_path / "n.sqlite")
    con = sqlite3.connect(db)
    con.execute("CREATE TABLE t (id INTEGER, parent_id INTEGER)")
    con.executemany(
        "INSERT INTO t VALUES (?, ?)",
        [(i, None if i < 10 else i - 1) for i in range(50)],
    )
    con.commit()
    con.close()
    df = read_sql_partitioned(
        spark, db, "t", partition_column="id",
        lower_bound=0, upper_bound=50, num_partitions=3,
    )
    assert dict(df.dtypes)["parent_id"] == "bigint"
    assert df.filter(F.col("parent_id").isNull()).count() == 10


# --- property tests (pure driver-side: parser + slice algebra) -----------

from hypothesis import given, settings
from hypothesis import strategies as st


@given(
    lower=st.integers(-1000, 1000),
    span=st.integers(0, 5000),
    n=st.integers(1, 64),
    probe=st.integers(-100_000, 100_000),
)
@settings(max_examples=200, deadline=None)
def test_slices_partition_every_integer_exactly_once(lower, span, n, probe):
    """spark.read.jdbc's slice semantics: for ANY bounds/partition count,
    every integer (inside or outside the bounds) matches exactly one
    slice predicate — completeness never depends on bound tightness."""
    preds = range_predicates("id", lower, lower + span, n)
    hits = sum(
        eval(
            p.replace("1=1", "True")
            .replace("id", f"({probe})")
            .replace("AND", "and")
        )
        for p in preds
    )
    assert hits == 1, (lower, span, n, probe, preds)


_cell = st.one_of(
    st.integers(-10**9, 10**9),
    st.floats(allow_nan=False, allow_infinity=False, width=32),
    st.text(
        alphabet=st.characters(whitelist_categories=("L", "N", "P", "Zs")),
        max_size=20,
    ),
    st.booleans(),
)


@given(
    rows=st.lists(st.lists(_cell, min_size=2, max_size=4), min_size=1, max_size=5)
)
@settings(max_examples=50, deadline=None)
def test_xlsx_roundtrip_property(tmp_path_factory, rows):
    """Random value grids survive write-as-SpreadsheetML -> parse_xlsx:
    numbers (int/float), strings (inline), and booleans come back with
    value equality (ints may surface as ints even when written float-
    integral — compared numerically)."""
    import zipfile as _zf
    from xml.sax.saxutils import escape

    from pwc_challenge_dataengineer_spark.sources.xlsx import parse_xlsx

    width = max(len(r) for r in rows)
    rows = [r + [None] * (width - len(r)) for r in rows]
    header = [f"c{i}" for i in range(width)]

    def cell(ref, v):
        if v is None:
            return ""
        if isinstance(v, bool):
            return f'<c r="{ref}" t="b"><v>{1 if v else 0}</v></c>'
        if isinstance(v, (int, float)):
            return f'<c r="{ref}"><v>{v!r}</v></c>'
        return f'<c r="{ref}" t="inlineStr"><is><t>{escape(v)}</t></is></c>'

    def col_letter(i):
        s = ""
        i += 1
        while i:
            i, rem = divmod(i - 1, 26)
            s = chr(ord("A") + rem) + s
        return s

    body = "".join(
        f'<row r="{ri + 1}">'
        + "".join(
            cell(f"{col_letter(ci)}{ri + 1}", v) for ci, v in enumerate(vals)
        )
        + "</row>"
        for ri, vals in enumerate(
            [header] + rows  # header row is strings
        )
    )
    # header row needs string cells
    p = tmp_path_factory.mktemp("xl") / "prop.xlsx"
    with _zf.ZipFile(p, "w") as zf:
        zf.writestr("xl/worksheets/sheet1.xml", _sheet(body))
    got_header, got_rows = parse_xlsx(open(p, "rb").read())
    assert len(got_rows) == len(rows)
    for want_row, got_row in zip(rows, got_rows):
        for want, got in zip(want_row, got_row):
            if want is None or (isinstance(want, str) and want == ""):
                assert got is None or got == ""
            elif isinstance(want, bool):
                assert got is want
            elif isinstance(want, (int, float)):
                assert got is not None and float(got) == float(want)
            else:
                assert got == want


def test_python_datasource_partitions_and_determinism(spark):
    from pwc_challenge_dataengineer_spark.sources.python_datasource import (
        register_ticks_source,
    )

    register_ticks_source(spark)

    def load(n, parts, seed):
        return (
            spark.read.format("synthetic_ticks")
            .option("n_rows", str(n))
            .option("n_partitions", str(parts))
            .option("seed", str(seed))
            .load()
        )

    df = load(1000, 8, 3)
    assert df.rdd.getNumPartitions() == 8
    assert df.count() == 1000
    # uneven split: ceil(10/3)=4 -> partitions cover 4+4+2
    assert load(10, 3, 0).count() == 10
    # per-partition generation covers the whole range exactly once
    ids = [r.tick_id for r in df.select("tick_id").collect()]
    assert sorted(ids) == list(range(1000))
    # deterministic re-read (task-retry / exactly-once contract)
    a = df.groupBy().sum("price_cents").collect()[0][0]
    b = load(1000, 8, 3).groupBy().sum("price_cents").collect()[0][0]
    assert a == b
    # seed changes the data
    c = load(1000, 8, 4).groupBy().sum("price_cents").collect()[0][0]
    assert a != c


def test_python_streaming_datasource_microbatches(spark, tmp_path):
    import time

    from pwc_challenge_dataengineer_spark.sources.python_datasource import (
        _tick_row,
        register_ticks_stream_source,
    )

    register_ticks_stream_source(spark)
    stream = (
        spark.readStream.format("synthetic_ticks_stream")
        .option("batch_size", "50")
        .option("seed", "3")
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("py_stream_ticks")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            n = spark.sql("SELECT COUNT(*) c FROM py_stream_ticks").first().c
            if n >= 150:
                break
            time.sleep(1)
    finally:
        q.stop()
    rows = spark.sql(
        "SELECT tick_id, price_cents, qty FROM py_stream_ticks ORDER BY tick_id"
    ).collect()
    n = len(rows)
    assert n >= 150 and n % 50 == 0  # whole micro-batches, no partial slices
    # every delivered row matches the closed form (offset replay fidelity)
    for r in rows:
        _, _, price_cents, qty = _tick_row(3, r.tick_id)
        assert (r.price_cents, r.qty) == (price_cents, qty)
    assert [r.tick_id for r in rows] == list(range(n))  # gapless, in order


def test_xml_roundtrip(spark, tmp_path):
    """Native Spark-4 XML: write with rowTag/rootTag, read back intact."""
    from pwc_challenge_dataengineer_spark.sources.readers import read_xml
    from pwc_challenge_dataengineer_spark.sources.writers import write_xml

    df = spark.createDataFrame(
        [(1, "alpha", 9.5), (2, "beta", -1.25), (3, None, 0.0)],
        "id int, name string, score double",
    )
    path = str(tmp_path / "xml_out")
    write_xml(df, path, row_tag="item", root_tag="items")
    back = read_xml(spark, path, row_tag="item")
    got = {(r["id"], r["name"], r["score"]) for r in back.collect()}
    assert got == {(1, "alpha", 9.5), (2, "beta", -1.25), (3, None, 0.0)}


def test_xml_explicit_schema_and_attributes(spark, tmp_path):
    """rowTag extraction with an explicit schema (no inference pass) and
    attribute columns (_attr) from hand-written XML."""
    from pyspark.sql import types as T

    from pwc_challenge_dataengineer_spark.sources.readers import read_xml

    xml = (
        "<orders>\n"
        '  <order id="7"><total>10.5</total></order>\n'
        '  <order id="8"><total>20.0</total></order>\n'
        "</orders>\n"
    )
    p = tmp_path / "orders.xml"
    p.write_text(xml)
    schema = T.StructType(
        [
            T.StructField("_id", T.LongType()),
            T.StructField("total", T.DoubleType()),
        ]
    )
    back = read_xml(spark, str(p), row_tag="order", schema=schema)
    got = sorted((r["_id"], r["total"]) for r in back.collect())
    assert got == [(7, 10.5), (8, 20.0)]


def test_orc_roundtrip_partitioned(spark, tmp_path):
    from pwc_challenge_dataengineer_spark.sources.readers import read_orc
    from pwc_challenge_dataengineer_spark.sources.writers import write_orc

    df = spark.createDataFrame(
        [(1, "a", 2024), (2, "b", 2024), (3, "c", 2025)],
        "id int, name string, yr int",
    )
    path = str(tmp_path / "orc_out")
    write_orc(df, path, partition_by=["yr"])
    back = read_orc(spark, path)
    assert back.count() == 3
    assert {r["yr"] for r in back.select("yr").distinct().collect()} == {2024, 2025}


def test_avro_gate_closed_by_fallback(spark, tmp_path):
    """The former jar gate is CLOSED (r8): without spark-avro on the
    classpath read_avro falls back to the pure-stdlib avrolite
    DataSource. A missing path now surfaces as a file error (the jar-less
    environment is no longer the failure), and a real avrolite-written
    dir reads back through the same read_avro entry point."""
    import pytest

    from pwc_challenge_dataengineer_spark.sources.avrolite import (
        register_avrolite,
    )
    from pwc_challenge_dataengineer_spark.sources.readers import read_avro

    with pytest.raises(Exception, match="nope.avro"):
        read_avro(spark, str(tmp_path / "nope.avro")).collect()
    register_avrolite(spark)
    out = str(tmp_path / "ok")
    spark.range(5).write.format("avrolite").mode("append").save(out)
    assert read_avro(spark, out).count() == 5
