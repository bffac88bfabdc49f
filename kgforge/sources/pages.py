"""Common-Crawl-style pages source (BASELINE.json input_hint).

Schema: url:string, warc_ts:timestamp[us], html:binary, lang:string —
plus carried metadata (doc_id, source, n_chars) used by the KG grammar.

Real deployments read an existing pages table with
``ray.data.read_parquet(paths, columns=[...])``; the sandbox has no such
table, so ``build_pages`` derives one DETERMINISTICALLY from the
driver-provided ``documents.parquet`` (seedless arithmetic on doc_id —
the same rows at any parallelism). ``wrap_html`` is the exact inverse of
stages/extract.extract_text, giving the north-rule byte-identical-text
invariant an executable test: extract(wrap(text)) == text.

Every 97th page gets a stray 0xFF byte inside an HTML comment to
exercise utf-8 errors='ignore' decode parity (csv2rdf-v5.py:437) without
touching body text.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

EPOCH_US = 1704067200000000  # 2024-01-01T00:00:00Z in µs
TS_STEP_S = 137


def page_url(source: str, doc_id: int) -> str:
    return f"https://{source}.example.org/doc/{doc_id}"


def wrap_html(text: str, doc_id: int) -> bytes:
    """Deterministic page template; inverse of extract_text."""
    esc = (text.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;"))
    return wrap_html_from_escaped(esc, doc_id)


class PageBuilder:
    """map_batches fn: documents rows -> pages rows (vectorized)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_id = batch["doc_id"].combine_chunks()
        ids = doc_id.to_numpy()
        src = batch["source"].combine_chunks().to_pandas()
        text = batch["text"].combine_chunks().to_pandas()
        url = ("https://" + src + ".example.org/doc/" +
               pd.Series(ids).astype(str).values)
        ts = pa.array(EPOCH_US + ids.astype(np.int64) * TS_STEP_S * 1_000_000,
                      type=pa.timestamp("us"))
        esc = (text.str.replace("&", "&amp;", regex=False)
                   .str.replace("<", "&lt;", regex=False)
                   .str.replace(">", "&gt;", regex=False))
        html = [wrap_html_from_escaped(e, int(i)) for e, i in zip(esc, ids)]
        return pa.table(
            {
                "url": pa.array(url, type=pa.string()),
                "warc_ts": ts,
                "html": pa.array(html, type=pa.binary()),
                "lang": batch["lang"],
                "doc_id": batch["doc_id"],
                "source": batch["source"],
                "n_chars": batch["n_chars"],
            }
        )


def wrap_html_from_escaped(esc: str, doc_id: int) -> bytes:
    junk = b"<!-- \xff bad byte -->" if doc_id % 97 == 0 else b""
    head = (f"<html><head><title>doc {doc_id}</title>"
            f"<style>p{{margin:0}}</style></head><body>").encode()
    tail = b"<script>var tracked=true;</script></body></html>"
    return head + junk + b"<p>" + esc.encode() + b"</p>" + tail


def build_pages(sf_dir: str, parallelism: int = -1) -> "ray.data.Dataset":
    """documents.parquet -> pages Dataset (streaming; no materialize)."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "text", "lang", "source", "n_chars"],
    )
    return ds.map_batches(PageBuilder(), batch_format="pyarrow")
