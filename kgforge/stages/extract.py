"""HTML→text extraction — deterministic, per-url byte-identical.

The reference's only "cleaning" is utf-8 decode with errors='ignore'
(csv2rdf-v5/csv2rdf-v5.py:437); this stage generalizes it to the web
pipeline's pages table (BASELINE.json input_hint): decode the
``html:binary`` column the same way, take the <body>, drop
script/style/comments, strip tags, unescape the five standard entities.

Two implementations, tested equal:
    extract_text(bytes) -> str          # scalar spec (oracle side)
    HtmlTextExtractor                    # vectorized map_batches stage
                                         # (actor pool: regexes compiled
                                         # once per actor in __init__)

The extractor is the exact inverse of sources/pages.wrap_html, which is
what makes the north-rule "byte-identical extracted text per url"
invariant testable end-to-end.
"""

from __future__ import annotations

import re

import pyarrow as pa

_SCRIPT_STYLE_COMMENT = r"(?s)<script\b.*?</script>|<style\b.*?</style>|<!--.*?-->"
_BODY = r"(?s)<body[^>]*>(.*)</body>"
_TAG = r"(?s)<[^>]*>"
# unescape order matters: &amp; LAST (so '&amp;lt;' -> '&lt;' not '<')
_ENTITIES = [("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
             ("&#x27;", "'"), ("&amp;", "&")]


def extract_text(html: bytes) -> str:
    """Scalar reference implementation (the executable spec)."""
    s = html.decode("utf-8", errors="ignore")
    m = re.search(_BODY, s)
    if m:
        s = m.group(1)
    s = re.sub(_SCRIPT_STYLE_COMMENT, "", s)
    s = re.sub(_TAG, "", s)
    for ent, ch in _ENTITIES:
        s = s.replace(ent, ch)
    return s


class HtmlTextExtractor:
    """Actor-pool ``map_batches`` stage: html:binary -> text:string.

    Stateful setup (compiled regexes) once per actor in __init__;
    per-batch work is pandas C-regex loops — no Python-level row loop.
    Use: ds.map_batches(HtmlTextExtractor, batch_format="pyarrow",
                        concurrency=N, batch_size=B)
    """

    def __init__(self, html_col: str = "html", text_col: str = "text"):
        self.html_col = html_col
        self.text_col = text_col
        self.re_ssc = re.compile(_SCRIPT_STYLE_COMMENT)
        self.re_body = re.compile(_BODY)
        self.re_tag = re.compile(_TAG)

    def __call__(self, batch: pa.Table) -> pa.Table:
        raw = batch[self.html_col].combine_chunks().to_pandas()
        s = raw.str.decode("utf-8", errors="ignore")
        body = s.str.extract(self.re_body, expand=False)
        s = body.where(body.notna(), s)
        s = s.str.replace(self.re_ssc, "", regex=True)
        s = s.str.replace(self.re_tag, "", regex=True)
        for ent, ch in _ENTITIES:
            s = s.str.replace(ent, ch, regex=False)
        return batch.append_column(self.text_col,
                                   pa.array(s.tolist(), type=pa.string()))
