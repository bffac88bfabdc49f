"""Central parquet reader: column-pruned read + schema-metadata strip.

pandas-written parquet carries a ``b'pandas'`` schema-metadata blob.
pyarrow Schemas WITH metadata are unhashable (``hash(schema)`` raises
"unhashable type: 'dict'"), and Ray's shuffle schema-dedup tries to
hash them — every shuffle stage downstream of a raw read then logs
"Failed to hash the schemas (for deduplication)" and falls back to an
O(n²) unify. Stripping the (engine-irrelevant) metadata at the read
kills the warning spam and restores the fast path. The strip map fuses
with the read operator, so there is no extra task or copy.
"""

from __future__ import annotations

import pyarrow as pa

import ray.data


def _strip_meta(batch: pa.Table) -> pa.Table:
    return batch.replace_schema_metadata(None)


def read_table(sf_dir: str, table: str,
               columns: list[str] | None = None) -> "ray.data.Dataset":
    """``read_parquet(f"{sf_dir}/{table}.parquet", columns=...)`` with
    pruned columns and metadata-free schemas."""
    ds = ray.data.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)
    return ds.map_batches(_strip_meta, batch_format="pyarrow")
