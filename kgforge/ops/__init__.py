"""kgforge.ops"""

from __future__ import annotations

import pyarrow as pa


def ensure_schema(ds: "ray.data.Dataset", schema: pa.Schema
                  ) -> "ray.data.Dataset":
    """Union a 0-row schema-carrying block into ``ds``.

    A ``groupby().map_groups`` over an input with ZERO groups emits no
    blocks at all — the resulting Dataset has schema None and
    ``to_pandas()`` returns a column-less frame. Ops whose result can
    legitimately be empty (similarity joins, searches) seed one empty
    block so consumers always see the declared schema; when the result
    is non-empty the extra block is a 0-row no-op."""
    import ray.data
    return ds.union(ray.data.from_arrow(schema.empty_table()))
