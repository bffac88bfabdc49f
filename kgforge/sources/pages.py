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
import pyarrow as pa

import ray.data

from .readers import read_table

EPOCH_US = 1704067200000000  # 2024-01-01T00:00:00Z in µs
TS_STEP_S = 137


def page_url(source: str, doc_id: int) -> str:
    return f"https://{source}.example.org/doc/{doc_id}"


def wrap_html(text: str, doc_id: int) -> bytes:
    """Deterministic page template; inverse of extract_text."""
    esc = (text.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;"))
    return wrap_html_from_escaped(esc, doc_id)


class PageBuilder:
    """map_batches fn: documents rows -> pages rows (vectorized — the
    whole page template is assembled with Arrow string kernels; only the
    final utf-8 encode materializes Python bytes objects, which the
    binary column requires)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        doc_id = batch["doc_id"].combine_chunks()
        ids = doc_id.to_numpy()
        id_str = doc_id.cast(pa.string())
        src = batch["source"].combine_chunks().cast(pa.string())
        text = batch["text"].combine_chunks().cast(pa.string())
        url = pc.binary_join_element_wise(
            pa.scalar("https://"), src, pa.scalar(".example.org/doc/"),
            id_str, "")
        ts = pa.array(EPOCH_US + ids.astype(np.int64) * TS_STEP_S * 1_000_000,
                      type=pa.timestamp("us"))
        esc = pc.replace_substring(text, pattern="&", replacement="&amp;")
        esc = pc.replace_substring(esc, pattern="<", replacement="&lt;")
        esc = pc.replace_substring(esc, pattern=">", replacement="&gt;")
        head = pc.binary_join_element_wise(
            pa.scalar("<html><head><title>doc "), id_str,
            pa.scalar("</title><style>p{margin:0}</style></head><body>"), "")
        junk = pc.if_else(pa.array(ids % 97 == 0),
                          pa.scalar("\x00JUNK\x00"), pa.scalar(""))
        page = pc.binary_join_element_wise(
            head, junk, pa.scalar("<p>"), esc,
            pa.scalar("</p><script>var tracked=true;</script></body></html>"),
            "")
        # encode + splice the raw 0xFF byte into the junk comment (it is
        # not valid utf-8 so it cannot travel inside the string kernel)
        raw = [p.encode().replace(b"\x00JUNK\x00", b"<!-- \xff bad byte -->")
               for p in page.to_pylist()]
        return pa.table(
            {
                "url": url.cast(pa.string()),
                "warc_ts": ts,
                "html": pa.array(raw, type=pa.binary()),
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


def build_pages(sf_dir: str, parallelism: int = -1,
                paths: list[str] | None = None) -> "ray.data.Dataset":
    """documents.parquet -> pages Dataset (streaming; no materialize).

    ``paths``: restrict to a subset of the table's shard files — the
    partitioned runner's input pruning (each partition reads ONLY its
    shards instead of filtering a full scan)."""
    cols = ["doc_id", "text", "lang", "source", "n_chars"]
    if paths is not None:
        import pyarrow as pa_
        import pyarrow.parquet as pq_
        full = pq_.read_schema(paths[0])
        schema = pa_.schema([full.field(c) for c in cols])
        ds = ray.data.read_parquet(paths, schema=schema, columns=cols)
    else:
        ds = read_table(sf_dir, "documents", columns=cols)
    return ds.map_batches(PageBuilder(), batch_format="pyarrow")
