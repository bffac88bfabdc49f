"""Deterministic column stringification — the engine's input adapter.

The reference reads CSV, so every cell is already a string
(csv2rdf-v5/csv2rdf-v5.py:436-438). Our inputs are typed Parquet
columns; grammar rules operate on strings, so each non-string column
gets ONE deterministic, SQL-reproducible text form. Each spec pairs a
vectorized Arrow/numpy kernel with the DuckDB expression producing the
identical bytes — `sql_expr()` is what query oracles embed, keeping the
Ray path and the SQL oracle in lockstep by construction.

Formats:
    int        decimal            <-> CAST(x AS VARCHAR)
    float(nd)  C printf %.{nd}f   <-> printf('%.{nd}f', x)
    timestamp  %Y-%m-%d %H:%M:%S  <-> strftime(x, ...)
    date       %Y-%m-%d           <-> strftime(x, ...)
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


class ColumnSpec:
    def __init__(self, kind: str, digits: int = 2):
        self.kind = kind
        self.digits = digits

    def to_string(self, arr: pa.ChunkedArray | pa.Array) -> pa.Array:
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        if self.kind == "string":
            return arr.cast(pa.string())
        if self.kind == "int":
            return arr.cast(pa.string())
        if self.kind == "float":
            # C printf semantics (round-half-even on IEEE doubles) —
            # byte-identical to DuckDB's printf
            np_vals = arr.to_numpy(zero_copy_only=False)
            out = np.char.mod(f"%.{self.digits}f", np_vals)
            return pa.array(out, type=pa.string())
        if self.kind == "timestamp":
            # Arrow's %S emits fractional seconds; floor to seconds
            # first so the bytes match DuckDB's strftime %S (plain cast
            # refuses lossy truncation)
            floored = pc.floor_temporal(arr, unit="second")
            return pc.strftime(floored.cast(pa.timestamp("s")),
                               format="%Y-%m-%d %H:%M:%S")
        if self.kind == "date":
            return pc.strftime(arr, format="%Y-%m-%d")
        raise ValueError(self.kind)

    def sql_expr(self, col: str) -> str:
        if self.kind == "string":
            return col
        if self.kind == "int":
            return f"CAST({col} AS VARCHAR)"
        if self.kind == "float":
            return f"printf('%.{self.digits}f', {col})"
        if self.kind == "timestamp":
            return f"strftime({col}, '%Y-%m-%d %H:%M:%S')"
        if self.kind == "date":
            return f"strftime({col}, '%Y-%m-%d')"
        raise ValueError(self.kind)


STRING = ColumnSpec("string")
INT = ColumnSpec("int")
TIMESTAMP = ColumnSpec("timestamp")
DATE = ColumnSpec("date")


def FLOAT(digits: int = 2) -> ColumnSpec:
    return ColumnSpec("float", digits)


def stringify(specs: dict[str, ColumnSpec]):
    """map_batches fn: replace each column in ``specs`` with its
    deterministic string form (other columns pass through)."""

    def fn(batch: pa.Table) -> pa.Table:
        for col, spec in specs.items():
            idx = batch.schema.get_field_index(col)
            batch = batch.set_column(
                idx, pa.field(col, pa.string()), spec.to_string(batch[col])
            )
        return batch

    return fn
