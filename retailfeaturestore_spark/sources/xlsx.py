"""S1 Excel ingest — a dependency-free xlsx reader that runs INSIDE Spark.

Parity target: the reference loads both workbook sheets through pandas
``read_excel`` and concatenates them (``jobs/ingest_xlsx_to_parquet.py:8-11``,
SURVEY.md §2.1 S1).  This environment has no openpyxl, and more importantly
the reference's driver-side parse is the wrong shape for a lakehouse: here
each workbook is parsed *on an executor* instead.

Spark shape: ``binaryFile`` source -> ``mapInPandas`` (Arrow-batched) with a
caller-declared schema.  An xlsx file is a zip archive of XML parts, so the
parser below is plain stdlib ``zipfile`` + ``xml.etree`` — no imports beyond
what ships with Python.  Parallelism is per-FILE (a zip member cannot be
split mid-stream), which is the honest unit for spreadsheet ingest: a 100 TB
landing zone is thousands of workbooks, and each task parses one while the
downstream normalize/bronze write redistributes on real keys.  A single
giant workbook should be landed as CSV/parquet instead — documented limit,
same advice the reference's pandas path would need.

Supported xlsx surface (everything the reference's UCI retail workbook and
common exporters emit): shared strings, inline strings, formula-cached
strings, booleans, numbers, blank cells, sparse cell references.  Dates
surface as Excel serial numbers (numeric) — converting them is the ingest
contract's job (P16/P17), matching how the reference's column cleanup owns
type repair.
"""

from __future__ import annotations

import io
import re
import zipfile
import xml.etree.ElementTree as ET
from collections.abc import Iterable, Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

__all__ = ["read_xlsx", "parse_xlsx_bytes", "write_minimal_xlsx"]

_MAIN_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_REL_NS = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}id"
_PKG_REL_NS = "{http://schemas.openxmlformats.org/package/2006/relationships}"
_CELL_REF = re.compile(r"([A-Z]+)(\d+)")


def _col_index(ref: str) -> int:
    """'A'->0, 'Z'->25, 'AA'->26 (base-26 bijective)."""
    n = 0
    for ch in ref:
        n = n * 26 + (ord(ch) - 64)
    return n - 1


def _cell_value(cell: ET.Element, shared: list[str]):
    t = cell.get("t", "n")
    if t == "inlineStr":
        is_el = cell.find(f"{_MAIN_NS}is")
        return "".join(x.text or "" for x in is_el.iter(f"{_MAIN_NS}t")) if is_el is not None else None
    v = cell.find(f"{_MAIN_NS}v")
    if v is None or v.text is None:
        return None
    if t == "s":
        return shared[int(v.text)]
    if t == "str":  # formula cached string
        return v.text
    if t == "b":
        return v.text == "1"
    if t == "e":  # error cell (#DIV/0!, #N/A, ...) -> null per coerce contract
        return None
    try:
        return float(v.text)  # "n" numeric (dates = serial numbers)
    except ValueError:
        return None


def parse_xlsx_bytes(
    data: bytes, sheets: Iterable[str] | None = None
) -> Iterator[tuple[str, list[list]]]:
    """Yield ``(sheet_name, rows)`` per worksheet; rows are dense lists
    (sparse cells filled with None), in sheet order."""
    want = set(sheets) if sheets is not None else None
    with zipfile.ZipFile(io.BytesIO(data)) as zf:
        shared: list[str] = []
        if "xl/sharedStrings.xml" in zf.namelist():
            root = ET.fromstring(zf.read("xl/sharedStrings.xml"))
            shared = [
                "".join(t.text or "" for t in si.iter(f"{_MAIN_NS}t"))
                for si in root.iter(f"{_MAIN_NS}si")
            ]
        rels = {
            rel.get("Id"): rel.get("Target")
            for rel in ET.fromstring(zf.read("xl/_rels/workbook.xml.rels")).iter(
                f"{_PKG_REL_NS}Relationship"
            )
        }
        wb = ET.fromstring(zf.read("xl/workbook.xml"))
        for sheet_el in wb.iter(f"{_MAIN_NS}sheet"):
            name = sheet_el.get("name")
            if want is not None and name not in want:
                continue
            target = rels[sheet_el.get(_REL_NS)].lstrip("/")
            member = target if target.startswith("xl/") else f"xl/{target}"
            ws = ET.fromstring(zf.read(member))
            rows: list[list] = []
            width = 0
            for row_el in ws.iter(f"{_MAIN_NS}row"):
                row: list = []
                for cell in row_el.iter(f"{_MAIN_NS}c"):
                    ref = cell.get("r")
                    if ref is not None:
                        m = _CELL_REF.match(ref)
                        idx = _col_index(m.group(1)) if m else len(row)
                    else:
                        idx = len(row)
                    while len(row) <= idx:
                        row.append(None)
                    row[idx] = _cell_value(cell, shared)
                width = max(width, len(row))
                rows.append(row)
            for row in rows:
                row.extend([None] * (width - len(row)))
            yield name, rows


def coerce_cell(v, dt: T.DataType):
    """Coerce a raw cell value to the declared Spark type; uncoercible cells
    become null (ingest never fails on a bad cell — type repair beyond this
    is the normalize layer's contract)."""
    if v is None:
        return None
    try:
        if isinstance(dt, (T.DoubleType, T.FloatType)):
            return float(v)
        if isinstance(dt, (T.LongType, T.IntegerType)):
            return int(float(v))
        if isinstance(dt, T.BooleanType):
            return bool(v)
        if isinstance(dt, T.StringType):
            if isinstance(v, float) and v.is_integer():
                return str(int(v))  # '85123' not '85123.0' (id columns)
            return str(v)
        return v
    except (TypeError, ValueError):
        return None


def iter_workbook_rows(
    content: bytes,
    names: list[str],
    dtypes: list[T.DataType],
    header: bool,
    sheet_list: list[str] | None,
) -> Iterator[tuple[list, str]]:
    """Yield ``(coerced_row, sheet_name)`` for every data row of every
    selected sheet — the shared per-file parse used by both the
    mapInPandas reader and the Python DataSource."""
    for sheet_name, rows in parse_xlsx_bytes(content, sheet_list):
        if not rows:
            continue
        if header:
            head = [str(c) if c is not None else "" for c in rows[0]]
            pos = [head.index(n) if n in head else -1 for n in names]
            body = rows[1:]
        else:
            pos = list(range(len(names)))
            body = rows
        for row in body:
            yield (
                [
                    coerce_cell(row[p], dt) if 0 <= p < len(row) else None
                    for p, dt in zip(pos, dtypes)
                ],
                sheet_name,
            )


def read_xlsx(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str,
    header: bool = True,
    sheets: Iterable[str] | None = None,
    add_source_columns: bool = False,
) -> DataFrame:
    """All sheets of all workbooks under ``path`` as ONE DataFrame (the
    reference's multi-sheet UNION ALL), parsed on executors.

    ``schema`` declares the output columns; with ``header=True`` each sheet's
    first row maps declared names to positions (sheets may order columns
    differently), otherwise declared order = positional.  Values are coerced
    to the declared type (numbers parsed from strings, integral floats
    narrowed to ints); cells that don't coerce become null rather than
    failing the ingest — type repair beyond that is the normalize layer's
    contract.  ``add_source_columns`` appends (_source_file, _sheet) lineage.
    """
    out_schema = (
        schema if isinstance(schema, T.StructType) else T.StructType.fromDDL(schema)
    )
    full_schema = out_schema
    if add_source_columns:
        full_schema = T.StructType(
            list(out_schema.fields)
            + [
                T.StructField("_source_file", T.StringType()),
                T.StructField("_sheet", T.StringType()),
            ]
        )
    names = [f.name for f in out_schema.fields]
    dtypes = [f.dataType for f in out_schema.fields]
    sheet_list = list(sheets) if sheets is not None else None

    def _parse(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            for file_path, content in zip(pdf["path"], pdf["content"]):
                out_rows: list[list] = []
                out_meta: list[tuple[str, str]] = []
                for row, sheet_name in iter_workbook_rows(
                    bytes(content), names, dtypes, header, sheet_list
                ):
                    out_rows.append(row)
                    out_meta.append((file_path, sheet_name))
                pdf_out = pd.DataFrame(out_rows, columns=names)
                if add_source_columns:
                    pdf_out["_source_file"] = [m[0] for m in out_meta]
                    pdf_out["_sheet"] = [m[1] for m in out_meta]
                yield pdf_out

    binary = spark.read.format("binaryFile").load(path).select("path", "content")
    return binary.mapInPandas(_parse, schema=full_schema)


# ---------------------------------------------------------------------------
# Minimal xlsx WRITER — test-fixture generator (no openpyxl in this
# environment to produce fixtures with), emitting the same part layout
# Excel/openpyxl produce: shared strings for text, plain <v> for numbers.
# ---------------------------------------------------------------------------

_CONTENT_TYPES = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
<Default Extension="xml" ContentType="application/xml"/>
<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
<Override PartName="/xl/sharedStrings.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sharedStrings+xml"/>
{sheet_overrides}
</Types>"""

_ROOT_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
</Relationships>"""


def _esc(s: str) -> str:
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def _col_letter(idx: int) -> str:
    letters = ""
    idx += 1
    while idx:
        idx, rem = divmod(idx - 1, 26)
        letters = chr(65 + rem) + letters
    return letters


def write_minimal_xlsx(path: str, sheets: dict[str, list[list]]) -> None:
    """Write ``{sheet_name: rows}`` as a conformant xlsx: strings go through
    sharedStrings (exercising the parser's indirection path), numbers/bools
    inline, None -> omitted cell (exercising sparse refs)."""
    shared: list[str] = []
    shared_idx: dict[str, int] = {}

    def sref(s: str) -> int:
        if s not in shared_idx:
            shared_idx[s] = len(shared)
            shared.append(s)
        return shared_idx[s]

    sheet_xml: dict[str, str] = {}
    for name, rows in sheets.items():
        parts = ["<sheetData>"]
        for r, row in enumerate(rows, start=1):
            parts.append(f'<row r="{r}">')
            for c, v in enumerate(row):
                if v is None:
                    continue
                ref = f"{_col_letter(c)}{r}"
                if isinstance(v, str):
                    parts.append(f'<c r="{ref}" t="s"><v>{sref(v)}</v></c>')
                elif isinstance(v, bool):
                    parts.append(f'<c r="{ref}" t="b"><v>{1 if v else 0}</v></c>')
                else:
                    parts.append(f'<c r="{ref}"><v>{v}</v></c>')
            parts.append("</row>")
        parts.append("</sheetData>")
        sheet_xml[name] = (
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
            + "".join(parts)
            + "</worksheet>"
        )

    sheet_names = list(sheets)
    wb_sheets = "".join(
        f'<sheet name="{_esc(n)}" sheetId="{i + 1}" r:id="rId{i + 1}"/>'
        for i, n in enumerate(sheet_names)
    )
    workbook = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
        'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
        f"<sheets>{wb_sheets}</sheets></workbook>"
    )
    wb_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        + "".join(
            f'<Relationship Id="rId{i + 1}" '
            'Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" '
            f'Target="worksheets/sheet{i + 1}.xml"/>'
            for i in range(len(sheet_names))
        )
        + f'<Relationship Id="rId{len(sheet_names) + 1}" '
        'Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/sharedStrings" '
        'Target="sharedStrings.xml"/>'
        "</Relationships>"
    )
    shared_xml = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
        f'count="{len(shared)}" uniqueCount="{len(shared)}">'
        + "".join(f"<si><t>{_esc(s)}</t></si>" for s in shared)
        + "</sst>"
    )
    overrides = "".join(
        f'<Override PartName="/xl/worksheets/sheet{i + 1}.xml" '
        'ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
        for i in range(len(sheet_names))
    )
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("[Content_Types].xml", _CONTENT_TYPES.format(sheet_overrides=overrides))
        zf.writestr("_rels/.rels", _ROOT_RELS)
        zf.writestr("xl/workbook.xml", workbook)
        zf.writestr("xl/_rels/workbook.xml.rels", wb_rels)
        zf.writestr("xl/sharedStrings.xml", shared_xml)
        for i, name in enumerate(sheet_names):
            zf.writestr(f"xl/worksheets/sheet{i + 1}.xml", sheet_xml[name])
