"""Property test for the sharded-xlsx cutting logic (Spark-free).

The shard loop below is the same sequence `read_xlsx_sharded`'s task body
executes (scan for first row, parse header, skip-with-discard to the shard
range, cut [first row-start >= i*L/N, first row-start >= (i+1)*L/N), parse
the slice).  Running it for EVERY shard of a randomly generated workbook at
a randomly drawn shard size, and comparing the union of parsed rows against
``parse_xlsx_bytes`` (the well-tested whole-document parser), pins the two
invariants example tests cannot sweep: no row is lost or duplicated at ANY
byte boundary, and cell content (XML-escaped specials, unicode, numerics,
booleans, sparse Nones) never confuses the C-speed row splitter.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from hypothesis import given, settings
from hypothesis import strategies as st

from retailfeaturestore_spark.sources.xlsx import (
    _SHEETDATA_END,
    _ROW_START,
    _MemberScanner,
    _parse_row_elements,
    _root_namespaces,
    _shared_strings,
    parse_xlsx_bytes,
    write_minimal_xlsx,
)

# cell text deliberately includes the XML-special and splitter-adjacent
# hazards: '<row ' lookalikes, entities, '&', quotes, unicode, whitespace
_TEXT = st.one_of(
    st.sampled_from(
        [
            "<row ",
            "</sheetData>",
            "a<b&c>d",
            'he said "x"',
            "tab\tsep",
            "ünïcode ☃",
            "",
            "plain",
        ]
    ),
    # XML 1.0 forbids control chars < 0x20 (except \t \n \r) even escaped;
    # the minimal fixture writer emits text verbatim (real Excel encodes
    # them as _x001F_), so the strategy draws only XML-valid characters —
    # the property under test is the shard CUTTER, not the writer
    st.text(
        alphabet=st.characters(
            codec="utf-8",
            exclude_categories=("Cs", "Cc"),
        ),
        min_size=0,
        max_size=12,
    ),
)
_CELL = st.one_of(
    st.none(),
    st.booleans(),
    st.floats(allow_nan=False, allow_infinity=False, width=32),
    st.integers(min_value=-10**6, max_value=10**6),
    _TEXT,
)


def _shard_rows(zf: zipfile.ZipFile, member: str, xml_size: int, n_shards: int):
    """Union of every shard's parsed rows, in shard order — mirrors the
    executor task body of read_xlsx_sharded (header=False variant: all
    rows are data)."""
    shared = _shared_strings(zf)
    chunk = -(-xml_size // n_shards)
    out: list[list] = []
    for shard in range(n_shards):
        start_t, end_t = shard * chunk, (shard + 1) * chunk
        with zf.open(member) as fh:
            sc = _MemberScanner(fh)
            first = sc.find(_ROW_START, 0)
            if first < 0:
                continue
            ns = _root_namespaces(sc.slice(0, first))
            scan_from = max(start_t, first)
            sc.discard_to(max(scan_from - sc._STRADDLE, 0))
            lo = sc.find(_ROW_START, scan_from, discard=True)
            if lo < 0 or lo >= end_t:
                continue
            hi = sc.find(_ROW_START, end_t)
            if hi < 0:
                hi = sc.find(_SHEETDATA_END, lo)
                if hi < 0:
                    hi = sc.end()
            out.extend(_parse_row_elements(sc.slice(lo, hi), shared, ns))
    return out


@settings(max_examples=40, deadline=None)
@given(
    rows=st.lists(
        st.lists(_CELL, min_size=1, max_size=5), min_size=1, max_size=40
    ),
    shard_bytes=st.integers(min_value=20, max_value=5000),
)
def test_sharded_cut_equals_whole_document_parse(rows, shard_bytes):
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "prop.xlsx")
        write_minimal_xlsx(path, {"S": rows})
        with zipfile.ZipFile(path) as zf:
            member = "xl/worksheets/sheet1.xml"
            xml_size = next(
                zi.file_size for zi in zf.infolist() if zi.filename == member
            )
            n_shards = max(1, -(-xml_size // shard_bytes))
            got = _shard_rows(zf, member, xml_size, n_shards)
        (_, expect), = parse_xlsx_bytes(open(path, "rb").read())

        # the whole-document parser pads every row to the sheet's global
        # width; the shard parser leaves trailing Nones implicit
        def norm(rs):
            return [
                tuple(r[: _rstrip_len(r)]) for r in rs
            ]

        def _rstrip_len(r):
            n = len(r)
            while n and r[n - 1] is None:
                n -= 1
            return n

        assert norm(got) == norm(expect), (
            f"{len(got)} rows from {n_shards} shards vs {len(expect)}"
        )


class _PeakTrackingScanner(_MemberScanner):
    """Records the peak resident buffer across every ensure step."""

    def __init__(self, fh):
        super().__init__(fh)
        self.peak = 0

    def ensure(self, n):
        super().ensure(n)
        self.peak = max(self.peak, len(self.buf))


def test_skip_phase_memory_is_bounded():
    """Skipping to a late shard of a giant member must hold O(1 MiB)
    resident, not the whole prefix (r12 advice: a single ensure(start)
    used to issue one read that inflated and buffered the entire
    [0, start) gap before any discard ran — N concurrent late shards of
    one multi-GB sheet summed to executor OOM)."""
    import io
    import re

    row = b'<row r="1"><c t="inline"><is><t>aaaaaaaaaaaaaaaa</t></is></c></row>'
    body = row * (8 * (1 << 20) // len(row))  # ~8 MiB of row elements
    sc = _PeakTrackingScanner(io.BytesIO(body))
    target = len(body) - (1 << 20)  # skip ~7 MiB into the stream
    lo = sc.find(_ROW_START, target, discard=True)
    assert lo >= target
    # bound: one skip-step chunk + one search-window chunk + straddle slack
    assert sc.peak <= (2 << 20) + (1 << 16), f"peak resident {sc.peak} bytes"
    # and the found offset is a genuine row start
    assert body[lo : lo + 4] == b"<row"


def test_skip_phase_memory_bounded_under_compression():
    """Same bound through a real DEFLATE zip member (ZipExtFile.read path
    — the production fh type): peak buffer while skipping most of a
    ~12 MiB-XML worksheet stays ~2 MiB."""
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "big.xlsx")
        # ~60k identical rows -> multi-MiB XML, tiny compressed
        write_minimal_xlsx(
            path, {"S": [[i, "x" * 64] for i in range(60_000)]}
        )
        with zipfile.ZipFile(path) as zf:
            member = "xl/worksheets/sheet1.xml"
            xml_size = next(
                zi.file_size for zi in zf.infolist() if zi.filename == member
            )
            assert xml_size > 4 << 20, "fixture too small to exercise skip"
            with zf.open(member) as fh:
                sc = _PeakTrackingScanner(fh)
                target = xml_size - (1 << 20)
                lo = sc.find(_ROW_START, target, discard=True)
                assert lo >= target
                assert sc.peak <= (2 << 20) + (1 << 16), (
                    f"peak resident {sc.peak} bytes for {xml_size}-byte member"
                )
