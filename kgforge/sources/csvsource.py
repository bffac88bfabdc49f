"""CSV source with the reference's exact decode semantics.

The reference streams CSV rows via ``csv.reader(open(f, encoding='utf-8',
errors='ignore'))`` (csv2rdf-v5/csv2rdf-v5.py:436-438) — bad bytes are
silently DROPPED, and Python's csv dialect (quoting, embedded newlines)
applies. Arrow's CSV reader can't drop bytes, so conformance inputs go
through Python's csv module, chunked into Arrow batches, and become a
Dataset via ``from_arrow``. This path is for grammar-conformance CSVs
(the reference's actual workload: ~100k-row catalog extracts); the
web-scale path is Parquet (sources/pages.py).

All columns are utf8 (CSV cells are strings — reference §1.2).
"""

from __future__ import annotations

import csv as _csv

import pyarrow as pa

import ray.data


def read_csv_tables(path: str, delimiter: str = ",",
                    chunk_rows: int = 8192,
                    ordinal_col: str | None = None,
                    ordinal_prefix: str = "") -> list[pa.Table]:
    """CSV file -> list of Arrow tables (header row = column names).

    ``ordinal_col`` (conformance option): append a column holding
    ``ordinal_prefix + str(line_number)`` with the reference's exact
    numbering — ``enumerate`` over the raw reader INCLUDING the header
    row, so the first data row is 1 (csv2rdf/csv2rdf.py:109-116). The
    ordinal becomes row CONTENT at read time, so everything downstream
    stays order/parallelism-independent."""
    reader = _csv.reader(open(path, "r", encoding="utf-8", errors="ignore"),
                         delimiter=delimiter)
    it = iter(reader)
    header = next(it)
    out_header = header + [ordinal_col] if ordinal_col else header
    tables: list[pa.Table] = []
    buf: list[list[str]] = []

    def flush():
        if not buf:
            return
        cols = list(zip(*buf))
        tables.append(pa.table(
            {h: pa.array(list(c), type=pa.string())
             for h, c in zip(out_header, cols)}))

    for i, row in enumerate(it, start=1):
        # ragged-row guard: pad/truncate to header arity (the reference
        # would IndexError; we keep the row, cells aligned by position)
        if len(row) < len(header):
            row = row + [""] * (len(header) - len(row))
        elif len(row) > len(header):
            row = row[:len(header)]
        if ordinal_col:
            row = row + [f"{ordinal_prefix}{i}"]
        buf.append(row)
        if len(buf) >= chunk_rows:
            flush()
            buf = []
    flush()
    if not tables:
        tables.append(pa.table(
            {h: pa.array([], type=pa.string()) for h in out_header}))
    return tables


def read_csv_source(path: str, delimiter: str = ",",
                    chunk_rows: int = 8192,
                    ordinal_col: str | None = None,
                    ordinal_prefix: str = "") -> "ray.data.Dataset":
    tables = read_csv_tables(path, delimiter, chunk_rows,
                             ordinal_col, ordinal_prefix)
    ds = ray.data.from_arrow(tables[0])
    for t in tables[1:]:
        ds = ds.union(ray.data.from_arrow(t))
    return ds
