"""Deterministic xlsx workbook fixture for the end-to-end S1 correctness gate.

The composed path under test is the reference's whole ingest front half
(``jobs/ingest_xlsx_to_parquet.py:8-42``): executor-side workbook parse
(:func:`..sources.xlsx.read_xlsx`) -> ``normalize_orders_raw`` (P1-P8 + P16,
including the Excel serial-number -> UTC timestamp repair).  Because the
input is a *file format*, not a testdata table, the DuckDB oracle is a
literal ``VALUES`` relation generated from the very same Python rows that
produce the workbook bytes — both sides derive from one source of truth, so
a hash mismatch can only mean the parser or the normalize contract broke.

The row mix deliberately covers: serial dates with fractional (quarter-day,
binary-exact) time parts, cancel invoices (``C`` prefix), second sheet with
reordered columns (header-mapping path), strings routed through
sharedStrings with padding whitespace (trim path), lowercase stock codes
(upper path), and quarantine rows (null customer / null date) that P6 must
drop.
"""

from __future__ import annotations

import os
import tempfile

# Excel 1900-system epoch offset vs Unix epoch, in days.
_EPOCH_DELTA_DAYS = 25569

_COUNTRIES = ["United Kingdom", " France ", "Germany", "EIRE", "Netherlands"]


def fixture_raw_rows() -> list[list]:
    """The workbook's data rows, in the reference's raw column order:
    [Invoice, StockCode, Description, Quantity, InvoiceDate(serial), Price,
    Customer ID, Country].  Quarter-day serial fractions are binary-exact
    doubles, so serial->seconds conversion is exact on every engine."""
    rows: list[list] = []
    for i in range(60):
        serial = 40179.0 + i + (i % 4) * 0.25  # 2010-01-01 + i days (+0/6/12/18h)
        invoice = ("C" if i % 10 == 9 else "") + str(536365 + i)
        rows.append(
            [
                invoice,
                f"8512{i % 7}a",  # lowercase tail -> upper() path
                f"  gift box {i} ",  # padded -> trim() path
                1 + (i % 11),
                serial,
                round(0.55 + (i % 9) * 0.25, 2),
                float(13000 + (i % 25)),
                _COUNTRIES[i % len(_COUNTRIES)],
            ]
        )
    # Quarantine rows: P6 must drop these (null key / null event time).
    rows.append(["999999", "x1", "no customer", 5, 40200.0, 1.0, None, "Spain"])
    rows.append(["999998", "x2", "no date", 5, None, 1.0, 13001.0, "Spain"])
    return rows


def ensure_fixture_workbook() -> str:
    """Write the two-sheet workbook (sheet 2 column-reordered) once to a
    content-addressed temp path; atomic rename so concurrent readers never
    see a partial zip.  Returns the workbook path.

    The filename embeds a digest of :func:`fixture_raw_rows`, so editing the
    fixture rows can never serve a stale pre-edit workbook from a previous
    process against a freshly-generated oracle (ADVICE r3: a pinned name
    survived restarts and would silently desynchronize the differential
    gate)."""
    import hashlib

    from .xlsx import write_minimal_xlsx

    digest = hashlib.md5(repr(fixture_raw_rows()).encode()).hexdigest()[:12]
    d = os.path.join(tempfile.gettempdir(), "rfs_fixtures")
    path = os.path.join(d, f"retail_{digest}.xlsx")
    if os.path.exists(path):
        return path
    os.makedirs(d, exist_ok=True)
    rows = fixture_raw_rows()
    head = ["Invoice", "StockCode", "Description", "Quantity", "InvoiceDate", "Price", "Customer ID", "Country"]
    first, second = rows[:40], rows[40:]
    rev = list(reversed(range(len(head))))
    sheets = {
        "Year 2009-2010": [head] + first,
        "Year 2010-2011": [[head[j] for j in rev]] + [[r[j] for j in rev] for r in second],
    }
    tmp = path + f".tmp{os.getpid()}"
    write_minimal_xlsx(tmp, sheets)
    os.replace(tmp, path)
    return path


def _expected_rows() -> list[tuple]:
    """Mirror of the normalize contract over :func:`fixture_raw_rows` —
    the oracle side's source of truth."""
    out = []
    for inv, sku, desc, qty, serial, price, cid, country in fixture_raw_rows():
        if cid is None or serial is None or qty is None:
            continue  # P6 quarantine
        secs = round((serial - _EPOCH_DELTA_DAYS) * 86400.0)
        out.append(
            (
                inv.strip(),
                sku.strip().upper(),
                desc.strip(),
                int(qty),
                secs,
                float(price),
                int(cid),
                country.strip(),
                inv.strip().startswith("C"),
            )
        )
    return out


def fixture_oracle_sql() -> str:
    """DuckDB ``VALUES`` relation equal to ``normalize_orders_raw(read_xlsx(...))``.

    ``line_amount`` is computed IN SQL (``quantity * unit_price``) rather
    than literal-embedded, so both engines perform the identical single IEEE
    multiply on identical inputs."""
    import datetime

    utc = datetime.timezone.utc
    vals = []
    for inv, sku, desc, qty, secs, price, cid, country, cancel in _expected_rows():
        ts = datetime.datetime.fromtimestamp(secs, utc).strftime("%Y-%m-%d %H:%M:%S")
        vals.append(
            f"('{inv}', '{sku}', '{desc}', {qty}, TIMESTAMP '{ts}', {price!r}, "
            f"{cid}, '{country}', {'TRUE' if cancel else 'FALSE'})"
        )
    return (
        "SELECT invoice, stock_code, description, CAST(quantity AS INTEGER) AS quantity,\n"
        "       invoice_date, CAST(unit_price AS DOUBLE) AS unit_price,\n"
        "       CAST(customer_id AS INTEGER) AS customer_id, country, is_cancel,\n"
        "       CAST(quantity AS DOUBLE) * CAST(unit_price AS DOUBLE) AS line_amount\n"
        "FROM (VALUES\n  " + ",\n  ".join(vals) + "\n"
        ") AS t(invoice, stock_code, description, quantity, invoice_date, unit_price, "
        "customer_id, country, is_cancel)"
    )
