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
