"""S1 Excel ingest: the dependency-free executor-side xlsx reader.

Fixture workbooks are produced by the module's own minimal writer (this
environment has no openpyxl to generate them with); the writer emits the
standard part layout — sharedStrings for text, inline <v> numerics, sparse
cell references — so the parser's indirection paths are all exercised.
"""

from __future__ import annotations

import pytest

from retailfeaturestore_spark.jobs import read_excel_sheets
from retailfeaturestore_spark.sources.xlsx import (
    parse_xlsx_bytes,
    read_xlsx,
    write_minimal_xlsx,
)


@pytest.fixture(scope="module")
def workbook(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("xlsx") / "retail.xlsx")
    header = ["Invoice", "StockCode", "Quantity", "Price", "Country"]
    write_minimal_xlsx(
        path,
        {
            "Year 2009-2010": [
                header,
                ["536365", "85123A", 6, 2.55, "United Kingdom"],
                ["536366", "71053", 4, 3.39, "France"],
                # sparse row: missing Country cell
                ["536367", "84406B", 2, 2.75, None],
            ],
            # second sheet reorders columns — header mapping must fix it
            "Year 2010-2011": [
                ["Country", "Invoice", "StockCode", "Quantity", "Price"],
                ["Germany", "579001", "22720", 12, 1.25],
            ],
        },
    )
    return path


def test_parse_bytes_roundtrip(workbook):
    with open(workbook, "rb") as f:
        data = f.read()
    sheets = dict(parse_xlsx_bytes(data))
    assert list(sheets) == ["Year 2009-2010", "Year 2010-2011"]
    rows = sheets["Year 2009-2010"]
    assert rows[0][:2] == ["Invoice", "StockCode"]
    assert rows[1] == ["536365", "85123A", 6.0, 2.55, "United Kingdom"]
    assert rows[3][4] is None  # sparse cell -> None


def test_read_xlsx_unions_sheets_with_header_mapping(spark, workbook):
    df = read_xlsx(
        spark,
        workbook,
        "Invoice string, StockCode string, Quantity long, Price double, Country string",
        add_source_columns=True,
    )
    rows = {r.Invoice: r for r in df.collect()}
    assert len(rows) == 4
    # sheet 2's reordered columns land under the right names
    assert rows["579001"].Country == "Germany"
    assert rows["579001"].Quantity == 12
    assert rows["579001"]._sheet == "Year 2010-2011"
    # numeric-typed coercion + integral-float narrowing for string ids
    assert rows["536365"].Price == 2.55
    assert rows["536365"].Invoice == "536365"
    assert rows["536367"].Country is None


def test_read_excel_sheets_defaults(spark, workbook):
    df = read_excel_sheets(spark, workbook)
    assert df.count() == 4
    assert "Invoice" in df.columns and "Country" in df.columns
    # columns absent from the workbook surface as all-null, not an error
    assert df.where(df["Description"].isNotNull()).count() == 0


def test_read_xlsx_sheet_filter(spark, workbook):
    df = read_xlsx(
        spark,
        workbook,
        "Invoice string, Quantity long",
        sheets=["Year 2010-2011"],
    )
    assert [r.Invoice for r in df.collect()] == ["579001"]


def test_workbook_roundtrip_property():
    """Property: any grid of strings/numbers/bools/Nones written by the
    minimal writer parses back cell-for-cell (strings via sharedStrings,
    numbers as floats, None as sparse-omitted -> None)."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    cell = st.one_of(
        st.none(),
        st.booleans(),
        st.integers(min_value=-10**9, max_value=10**9),
        st.floats(allow_nan=False, allow_infinity=False, width=32),
        st.text(
            alphabet=st.characters(blacklist_categories=("Cs", "Cc")),
            min_size=0,
            max_size=12,
        ),
    )
    grid = st.lists(st.lists(cell, min_size=1, max_size=6), min_size=1, max_size=8)

    @settings(max_examples=40, deadline=None, suppress_health_check=list(HealthCheck))
    @given(grid)
    def prop(rows):
        import os
        import tempfile

        width = max(len(r) for r in rows)
        padded = [list(r) + [None] * (width - len(r)) for r in rows]
        fd, path = tempfile.mkstemp(suffix=".xlsx")
        os.close(fd)
        try:
            write_minimal_xlsx(path, {"S": padded})
            with open(path, "rb") as f:
                parsed = dict(parse_xlsx_bytes(f.read()))["S"]
        finally:
            os.unlink(path)
        # all-None trailing columns narrow the parsed width; compare on the
        # parsed grid padded back out
        got = [list(r) + [None] * (width - len(r)) for r in parsed]
        assert len(got) == len(padded)
        for prow, grow in zip(padded, got):
            for pv, gv in zip(prow, grow):
                if pv is None or isinstance(pv, (bool, str)):
                    assert gv == pv or (pv == "" and gv is None) or gv == (None if pv == "" else pv)
                else:
                    assert gv == float(pv)

    prop()


def test_error_cells_coerce_to_null():
    """t="e" error cells (#DIV/0!, #N/A — common in exporter workbooks) and
    malformed numerics null out instead of failing the executor task."""
    import xml.etree.ElementTree as ET

    from retailfeaturestore_spark.sources.xlsx import _cell_value

    ns = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
    err = ET.fromstring(f'<c xmlns="{ns}" r="A1" t="e"><v>#DIV/0!</v></c>')
    assert _cell_value(err, []) is None
    bad = ET.fromstring(f'<c xmlns="{ns}" r="A1"><v>not-a-number</v></c>')
    assert _cell_value(bad, []) is None


@pytest.fixture(scope="module")
def dated_workbook(tmp_path_factory):
    """Workbook shaped like the real UCI export: serial-number dates,
    float-typed Customer ID, a cancel invoice, and a quarantine row."""
    path = str(tmp_path_factory.mktemp("xlsx") / "retail_dated.xlsx")
    header = ["Invoice", "StockCode", "Description", "Quantity",
              "InvoiceDate", "Price", "Customer ID", "Country"]
    write_minimal_xlsx(
        path,
        {
            "Year 2009-2010": [
                header,
                # serial 40179.25 = 2010-01-01 06:00:00 UTC
                ["536365", "85123a", " box ", 6, 40179.25, 2.55, 17850.0, "United Kingdom"],
                ["C536379", "22720", "cancel", 1, 40180.5, 1.0, 17850.0, "United Kingdom"],
                # no customer id -> P6 quarantine
                ["536380", "84406", "orphan", 2, 40181.0, 1.0, None, "France"],
            ],
        },
    )
    return path


def test_ingest_serial_dates_end_to_end(spark, dated_workbook, tmp_path):
    """The composed real path: executor xlsx parse -> normalize (serial-date
    repair, double customer-id repair) -> bronze sink.  Regression for the
    round-2 wiring bug where serial dates were nulled by try_cast(timestamp)
    and P6 then dropped EVERY row of a real workbook."""
    import datetime

    from retailfeaturestore_spark.jobs import ingest_to_bronze, read_excel_sheets

    bronze = str(tmp_path / "bronze")
    ingest_to_bronze(spark, read_excel_sheets(spark, dated_workbook), bronze)
    rows = {r.invoice: r for r in spark.read.parquet(bronze).collect()}
    assert set(rows) == {"536365", "C536379"}  # nonzero; quarantine dropped
    assert rows["536365"].invoice_date == datetime.datetime(2010, 1, 1, 6, 0, 0)
    assert rows["536365"].customer_id == 17850  # 17850.0 double -> int
    assert rows["536365"].stock_code == "85123A"
    assert rows["536365"].description == "box"
    assert rows["536365"].line_amount == 6 * 2.55
    assert rows["C536379"].is_cancel is True
    assert rows["C536379"].invoice_date == datetime.datetime(2010, 1, 2, 12, 0, 0)


def test_fixture_workbook_matches_values_oracle(spark):
    """The registered xlsx_ingest_normalize query returns exactly the rows
    its VALUES oracle declares (driver-independent local differential)."""
    import duckdb

    from retailfeaturestore_spark.queries import REGISTRY

    qd = REGISTRY["xlsx_ingest_normalize"]
    got = qd.fn(spark, "/unused").toPandas().sort_values("invoice").reset_index(drop=True)
    exp = duckdb.sql(qd.oracle).df().sort_values("invoice").reset_index(drop=True)
    assert len(got) == len(exp) == 60
    assert sorted(got.columns) == sorted(exp.columns)
    for c in ("invoice", "quantity", "customer_id", "is_cancel", "line_amount"):
        assert list(got[c]) == list(exp[c]), c


def test_python_datasource_equals_mapinpandas_reader(spark):
    """The Spark 4 Python DataSource (format('rfs_xlsx')) and the
    binaryFile->mapInPandas reader must produce identical rows from the
    fixture workbook."""
    from retailfeaturestore_spark.sources.xlsx import read_xlsx
    from retailfeaturestore_spark.sources.xlsx_datasource import XlsxDataSource
    from retailfeaturestore_spark.sources.xlsx_fixture import ensure_fixture_workbook

    path = ensure_fixture_workbook()
    ddl = (
        "Invoice string, StockCode string, Description string, Quantity long, "
        "InvoiceDate double, Price double, `Customer ID` double, Country string"
    )
    spark.dataSource.register(XlsxDataSource)
    via_ds = (
        spark.read.format("rfs_xlsx").schema(ddl).option("header", "true").load(path)
    )
    via_mip = read_xlsx(spark, path, ddl)
    a = sorted(map(tuple, via_ds.collect()))
    b = sorted(map(tuple, via_mip.collect()))
    assert a == b and len(a) > 0
    assert via_ds.schema == via_mip.schema


def test_python_datasource_bronze_parity(spark):
    """End-to-end bronze parity (VERDICT r4 next-round #8): pushing the
    DataSource registration path through the full ingest normalize contract
    must yield bronze identical to the read_xlsx path — not just equal raw
    rows, but equal post-repair values (serial-date -> UTC timestamp, trims,
    coercions)."""
    from retailfeaturestore_spark.operators.normalize import normalize_orders_raw
    from retailfeaturestore_spark.sources.xlsx import read_xlsx
    from retailfeaturestore_spark.sources.xlsx_datasource import XlsxDataSource
    from retailfeaturestore_spark.sources.xlsx_fixture import ensure_fixture_workbook

    path = ensure_fixture_workbook()
    ddl = (
        "Invoice string, StockCode string, Description string, Quantity long, "
        "InvoiceDate double, Price double, `Customer ID` double, Country string"
    )
    spark.dataSource.register(XlsxDataSource)
    via_ds = spark.read.format("rfs_xlsx").schema(ddl).load(path)
    bronze_ds = normalize_orders_raw(via_ds)
    bronze_mip = normalize_orders_raw(read_xlsx(spark, path, ddl))
    assert bronze_ds.schema == bronze_mip.schema
    a = sorted(map(tuple, bronze_ds.collect()))
    b = sorted(map(tuple, bronze_mip.collect()))
    assert a == b and len(a) == 60


def test_python_datasource_rejects_uri_scheme_paths(spark):
    """Driver-side glob cannot list object stores: a URI-scheme load must
    fail loudly (pointing at the binaryFile path), never return a silently
    empty DataFrame (ADVICE r4)."""
    from retailfeaturestore_spark.sources.xlsx_datasource import XlsxDataSource

    spark.dataSource.register(XlsxDataSource)
    df = (
        spark.read.format("rfs_xlsx")
        .schema("Invoice string")
        .load("s3a://bucket/workbooks/*.xlsx")
    )
    with pytest.raises(Exception, match="URI|scheme|read_xlsx"):
        df.collect()


@pytest.mark.slow  # throughput gate, ~90s workbook build+parse (driver-window fit, r14)
def test_xlsx_parser_throughput_100k_rows(spark, tmp_path):
    """Scaled ingest exercise (VERDICT r5 'missing' #3 proxy: the real UCI
    workbook is 1.07M rows across two sheets and is not present in this
    environment): a 100k-row two-sheet synthetic workbook must parse
    through the executor-side reader with exact row fidelity and a
    throughput that extrapolates to the reference workbook in under
    three minutes."""
    import time

    from pyspark.sql import functions as F

    from retailfeaturestore_spark.sources.xlsx import (
        read_xlsx,
        write_minimal_xlsx,
    )

    n = 100_000
    head = [
        "Invoice", "StockCode", "Description", "Quantity",
        "InvoiceDate", "Price", "Customer ID", "Country",
    ]

    def row(i):
        return [
            ("C" if i % 50 == 49 else "") + str(500000 + i),
            f"sku{i % 3000}",
            f"item {i % 997} description",
            1 + (i % 12),
            40179.0 + (i % 700) + (i % 4) * 0.25,
            round(0.5 + (i % 40) * 0.25, 2),
            float(10000 + (i % 5000)),
            ["United Kingdom", "France", "Germany"][i % 3],
        ]

    half = n // 2
    path = str(tmp_path / "big.xlsx")
    write_minimal_xlsx(
        path,
        {
            "s1": [head] + [row(i) for i in range(half)],
            "s2": [head] + [row(i) for i in range(half, n)],
        },
    )
    schema = (
        "Invoice string, StockCode string, Description string, Quantity long, "
        "InvoiceDate double, Price double, `Customer ID` double, Country string"
    )
    t0 = time.time()
    df = read_xlsx(spark, path, schema)
    assert df.count() == n
    elapsed = time.time() - t0
    # exact fidelity at both sheet boundaries and a cancel row
    got = {
        r["Invoice"]: r
        for r in df.where(
            F.col("Invoice").isin("500000", str(500000 + half), "C500049")
        ).collect()
    }
    assert got["500000"]["Quantity"] == 1
    assert got[str(500000 + half)]["InvoiceDate"] == row(half)[4]
    assert got["C500049"]["Price"] == row(49)[5]
    # throughput gate: measured ~10k rows/s (single-task stdlib XML parse)
    # on the r5-r12 boxes; the r13 box measures 5.3k cold / 6.5k warm on
    # BIT-IDENTICAL reader code (box drift, same class as the r11/r12
    # drift records in BASELINE.md).  r14 (ADVICE r13 #4): the floor is
    # env-parameterized PER BOX instead of permanently relaxed — the
    # default restores the historical 6k gate (fast boxes / CI keep the
    # tight bar, so a real ~40% reader regression fails there again), and
    # a drifted box states its calibration explicitly, e.g.
    # RFS_XLSX_MIN_ROWS_PER_SEC=3500 on the r13/r14 sandbox.  Either floor
    # extrapolates the 1.07M-row UCI workbook to single-digit minutes per
    # file (the sharded reader is the large-workbook path;
    # read_excel_sheets auto-dispatches above 64 MiB worksheet XML).
    import os

    floor = float(os.environ.get("RFS_XLSX_MIN_ROWS_PER_SEC", "6000"))
    assert n / elapsed > floor, f"{n / elapsed:.0f} rows/s (floor {floor:.0f})"


# ---------------------------------------------------------------------------
# Sharded single-workbook reader (VERDICT r11 next-round #7): intra-sheet
# row-range parallelism must be invisible — byte-identical output to the
# per-file reader on every fixture shape, at every shard granularity.
# ---------------------------------------------------------------------------


def _sorted_pdf(df, cols):
    return (
        df.toPandas()
        .sort_values(cols, na_position="last")
        .reset_index(drop=True)
    )


def test_sharded_reader_equals_per_file_reader(spark, workbook):
    """Multi-sheet + header remapping + sparse cells + lineage columns,
    forced to many tiny shards so every boundary case (header-only shard,
    mid-row cut candidates, final-shard sheetData cut) is exercised."""
    import pandas as pd

    from retailfeaturestore_spark.sources.xlsx import read_xlsx_sharded

    schema = (
        "Invoice string, StockCode string, Quantity long, Price double, "
        "Country string"
    )
    cols = ["Invoice", "StockCode", "Quantity", "Price", "Country"]
    a = read_xlsx(spark, workbook, schema, add_source_columns=True)
    b = read_xlsx_sharded(
        spark, workbook, schema, add_source_columns=True,
        target_shard_bytes=64,  # ~1 row per shard: maximal boundary stress
    )
    pd.testing.assert_frame_equal(
        _sorted_pdf(a, cols), _sorted_pdf(b, cols)
    )


def test_sharded_reader_headerless_and_sheet_filter(spark, workbook):
    import pandas as pd

    from retailfeaturestore_spark.sources.xlsx import read_xlsx_sharded

    schema = (
        "Country string, Invoice string, StockCode string, Quantity long, "
        "Price double"
    )
    cols = ["Country", "Invoice", "StockCode", "Quantity", "Price"]
    a = read_xlsx(
        spark, workbook, schema, header=False, sheets=["Year 2010-2011"]
    )
    b = read_xlsx_sharded(
        spark, workbook, schema, header=False, sheets=["Year 2010-2011"],
        target_shard_bytes=48,
    )
    # header=False surfaces the header text row as data in both readers
    pa = _sorted_pdf(a, cols)
    pb = _sorted_pdf(b, cols)
    assert len(pa) == 2  # header text row + 1 data row
    pd.testing.assert_frame_equal(pa, pb)


def test_sharded_reader_boundary_sweep(spark, tmp_path):
    """Row counts must be exact at EVERY shard size: a row lost or
    duplicated at a shard boundary is the failure mode this reader must
    prove against (ownership rule: a row belongs to the shard whose byte
    range contains its '<row' start)."""
    from retailfeaturestore_spark.sources.xlsx import read_xlsx_sharded

    n = 500
    rows = [["K", "V"]] + [[f"k{i:04d}", float(i)] for i in range(n)]
    path = str(tmp_path / "sweep.xlsx")
    write_minimal_xlsx(path, {"S": rows})
    for tsb in (37, 256, 4096, 1 << 30):
        df = read_xlsx_sharded(
            spark, path, "K string, V double", target_shard_bytes=tsb
        )
        got = df.toPandas()
        assert len(got) == n, (tsb, len(got))
        assert got["K"].nunique() == n, tsb
        assert got["V"].sum() == n * (n - 1) / 2, tsb


def test_sharded_reader_empty_sheet(spark, tmp_path):
    from retailfeaturestore_spark.sources.xlsx import read_xlsx_sharded

    path = str(tmp_path / "empty.xlsx")
    write_minimal_xlsx(path, {"E": []})
    assert read_xlsx_sharded(spark, path, "K string, V double").count() == 0


def test_read_excel_sheets_dispatches_giant_workbooks(spark, tmp_path, workbook):
    """The ingest entry point must route a workbook whose worksheet XML
    exceeds the shard threshold through the sharded reader (same output
    contract), and keep ordinary workbooks on the per-file reader."""
    import pandas as pd

    from retailfeaturestore_spark.jobs import read_excel_sheets

    schema = "Invoice string, StockCode string, Quantity long, Price double"
    cols = ["Invoice", "StockCode", "Quantity", "Price"]
    small = read_excel_sheets(spark, workbook, schema)
    # threshold of 1 byte forces every workbook onto the sharded path
    sharded = read_excel_sheets(
        spark, workbook, schema, shard_threshold_bytes=1
    )
    a = small.toPandas().sort_values(cols, na_position="last").reset_index(drop=True)
    b = sharded.toPandas().sort_values(cols, na_position="last").reset_index(drop=True)
    assert len(a) == 4  # 3 + 1 rows across the two sheets
    pd.testing.assert_frame_equal(a, b)


def test_sharded_reader_handles_excel_prefixed_attributes(spark, tmp_path):
    """Real Excel declares extension namespaces on the worksheet ROOT
    (xmlns:x14ac, xmlns:mc) and uses them on every row
    (x14ac:dyDescent="0.25").  A row slice re-wrapped without replaying
    those declarations raises 'unbound prefix' — the r12 review's top
    finding, invisible to fixture-only tests because the minimal writer
    never emits prefixed attributes.  This fixture retrofits them the way
    Excel writes them."""
    import re
    import zipfile

    import pandas as pd

    from retailfeaturestore_spark.sources.xlsx import (
        read_xlsx,
        read_xlsx_sharded,
        write_minimal_xlsx,
    )

    src = str(tmp_path / "plain.xlsx")
    n = 300
    rows = [["K", "V"]] + [[f"k{i:03d}", float(i)] for i in range(n)]
    write_minimal_xlsx(src, {"S": rows})

    dst = str(tmp_path / "excelish.xlsx")
    with zipfile.ZipFile(src) as zin, zipfile.ZipFile(
        dst, "w", zipfile.ZIP_DEFLATED
    ) as zout:
        for zi in zin.infolist():
            data = zin.read(zi.filename)
            if zi.filename.startswith("xl/worksheets/"):
                xml = data.decode()
                xml = xml.replace(
                    '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">',
                    '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
                    'xmlns:mc="http://schemas.openxmlformats.org/markup-compatibility/2006" '
                    'xmlns:x14ac="http://schemas.microsoft.com/office/spreadsheetml/2009/9/ac" '
                    'mc:Ignorable="x14ac">',
                )
                xml = re.sub(
                    r'<row r="(\d+)">',
                    r'<row r="\1" spans="1:2" x14ac:dyDescent="0.25">',
                    xml,
                )
                data = xml.encode()
            zout.writestr(zi.filename, data)

    schema = "K string, V double"
    a = (
        read_xlsx(spark, dst, schema)
        .toPandas()
        .sort_values("K")
        .reset_index(drop=True)
    )
    b = (
        read_xlsx_sharded(spark, dst, schema, target_shard_bytes=2048)
        .toPandas()
        .sort_values("K")
        .reset_index(drop=True)
    )
    assert len(a) == n
    pd.testing.assert_frame_equal(a, b)


def test_sharded_reader_over_workbook_directory(spark, tmp_path):
    """Directory enumeration: the sharded reader must union every sheet
    of every workbook under the path with correct per-file lineage, same
    as the per-file reader."""
    import pandas as pd

    from retailfeaturestore_spark.sources.xlsx import read_xlsx_sharded

    for i in range(3):
        rows = [["K", "V"]] + [[f"w{i}k{j}", float(j)] for j in range(50)]
        write_minimal_xlsx(str(tmp_path / f"wb{i}.xlsx"), {"S": rows})
    schema = "K string, V double"
    a = (
        read_xlsx(spark, str(tmp_path), schema, add_source_columns=True)
        .toPandas().sort_values("K").reset_index(drop=True)
    )
    b = (
        read_xlsx_sharded(
            spark, str(tmp_path), schema,
            add_source_columns=True, target_shard_bytes=256,
        )
        .toPandas().sort_values("K").reset_index(drop=True)
    )
    assert len(a) == 150
    pd.testing.assert_frame_equal(a, b)


def _write_foreign_style_workbook(path: str) -> None:
    """A workbook in the shape REAL producers (Excel, openpyxl) emit and
    the repo's minimal writer never does: pretty-printed XML (newlines and
    indentation BETWEEN row elements), dimension/sheetViews/cols before
    sheetData and pageMargins after it, spans/s/ht attributes on rows,
    x14ac:dyDescent prefixed attributes under an mc:Ignorable declaration,
    and sharedStrings with multi-run formatted text (<si><r><rPr/><t>)
    that concatenates per run.  (r12 code-review found the namespace
    replay only via a synthetic fixture; this pins the broader
    foreign-producer surface byte-shape.)"""
    import zipfile

    ct = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>\n'
        '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
        '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
        '<Default Extension="xml" ContentType="application/xml"/>'
        '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
        '<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
        '<Override PartName="/xl/sharedStrings.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sharedStrings+xml"/>'
        "</Types>"
    )
    rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>\n'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>'
        "</Relationships>"
    )
    wb = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>\n'
        '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
        'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
        "<sheets>"
        '<sheet name="Data" sheetId="1" r:id="rId1"/>'
        "</sheets></workbook>"
    )
    wb_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>\n'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>'
        "</Relationships>"
    )
    # multi-run formatted string: parser must concatenate ALL <t> runs
    shared = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>\n'
        '<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="4" uniqueCount="4">\n'
        "  <si><t>Invoice</t></si>\n"
        "  <si><t>Country</t></si>\n"
        '  <si><r><rPr><b/></rPr><t>United </t></r><r><t>Kingdom</t></r></si>\n'
        '  <si><t xml:space="preserve">France</t></si>\n'
        "</sst>"
    )
    sheet = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>\n'
        '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
        'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships" '
        'xmlns:mc="http://schemas.openxmlformats.org/markup-compatibility/2006" '
        'xmlns:x14ac="http://schemas.microsoft.com/office/spreadsheetml/2009/9/ac" '
        'mc:Ignorable="x14ac">\n'
        '  <dimension ref="A1:B3"/>\n'
        "  <sheetViews>\n"
        '    <sheetView tabSelected="1" workbookViewId="0"/>\n'
        "  </sheetViews>\n"
        '  <sheetFormatPr defaultRowHeight="15" x14ac:dyDescent="0.25"/>\n'
        '  <cols><col min="1" max="2" width="12.85546875" customWidth="1"/></cols>\n'
        "  <sheetData>\n"
        '    <row r="1" spans="1:2" x14ac:dyDescent="0.25">\n'
        '      <c r="A1" t="s"><v>0</v></c>\n'
        '      <c r="B1" t="s"><v>1</v></c>\n'
        "    </row>\n"
        '    <row r="2" spans="1:2" ht="15.75" s="1" customFormat="1" x14ac:dyDescent="0.25">\n'
        '      <c r="A2" s="1"><v>536365</v></c>\n'
        '      <c r="B2" t="s" s="1"><v>2</v></c>\n'
        "    </row>\n"
        '    <row r="3" spans="1:2" x14ac:dyDescent="0.25">\n'
        '      <c r="A3"><v>536366</v></c>\n'
        '      <c r="B3" t="s"><v>3</v></c>\n'
        "    </row>\n"
        "  </sheetData>\n"
        '  <pageMargins left="0.7" right="0.7" top="0.75" bottom="0.75" header="0.3" footer="0.3"/>\n'
        "</worksheet>"
    )
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("[Content_Types].xml", ct)
        zf.writestr("_rels/.rels", rels)
        zf.writestr("docProps/app.xml", "<Properties/>")  # foreign extra member
        zf.writestr("xl/workbook.xml", wb)
        zf.writestr("xl/_rels/workbook.xml.rels", wb_rels)
        zf.writestr("xl/sharedStrings.xml", shared)
        zf.writestr("xl/worksheets/sheet1.xml", sheet)


def test_foreign_style_workbook_both_readers_agree(spark, tmp_path):
    """Both readers must parse the foreign-producer byte shape (pretty-
    printed rows, style attributes, multi-run shared strings) and agree."""
    from retailfeaturestore_spark.sources.xlsx import read_xlsx_sharded

    path = str(tmp_path / "foreign.xlsx")
    _write_foreign_style_workbook(path)
    schema = "Invoice string, Country string"
    per_file = read_xlsx(spark, path, schema)
    # tiny shard size forces multiple shards across the indented XML, so
    # the row cutter must handle whitespace BETWEEN row elements
    sharded = read_xlsx_sharded(spark, path, schema, target_shard_bytes=64)
    a = sorted(map(tuple, per_file.collect()))
    b = sorted(map(tuple, sharded.collect()))
    assert a == b
    assert a == [
        ("536365", "United Kingdom"),  # multi-run si concatenated
        ("536366", "France"),
    ]


def test_openpyxl_written_workbook_differential(spark, tmp_path):
    """Where openpyxl exists (the real-deps CI leg), write a genuinely
    foreign workbook with it and require both readers to parse it
    identically (VERDICT r12 next-round #7)."""
    openpyxl = pytest.importorskip("openpyxl")
    from retailfeaturestore_spark.sources.xlsx import read_xlsx_sharded

    path = str(tmp_path / "opx.xlsx")
    wb = openpyxl.Workbook()
    ws = wb.active
    ws.title = "Data"
    ws.append(["Invoice", "Quantity", "Price", "Country"])
    ws.append(["536365", 6, 2.55, "United Kingdom"])
    ws.append(["536366", 4, 3.39, "Français & <co>"])
    ws.append(["536367", None, 2.75, None])  # sparse row
    wb.save(path)
    schema = "Invoice string, Quantity long, Price double, Country string"
    per_file = sorted(map(tuple, read_xlsx(spark, path, schema).collect()))
    sharded = sorted(
        map(
            tuple,
            read_xlsx_sharded(
                spark, path, schema, target_shard_bytes=64
            ).collect(),
        )
    )
    assert per_file == sharded
    assert per_file == [
        ("536365", 6, 2.55, "United Kingdom"),
        ("536366", 4, 3.39, "Français & <co>"),
        ("536367", None, 2.75, None),
    ]
