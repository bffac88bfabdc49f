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


_BODY_NAMED = r"(?s)<body[^>]*>(?P<body>.*)</body>"


class HtmlTextExtractor:
    """``map_batches`` stage: html:binary -> text:string.

    The lossy utf-8 decode (errors='ignore', csv2rdf-v5.py:437 parity)
    has no Arrow kernel, so it is the one per-row step (C-level
    ``bytes.decode``); everything after runs as Arrow RE2 kernels over
    the whole column — no pandas round-trip, no Python-object rebuild.
    Use: ds.map_batches(HtmlTextExtractor(), batch_format="pyarrow")
    """

    def __init__(self, html_col: str = "html", text_col: str = "text"):
        self.html_col = html_col
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        raw = batch[self.html_col].combine_chunks()
        decoded = pa.array(
            [b.decode("utf-8", "ignore") if b is not None else None
             for b in raw.to_pylist()], type=pa.string())
        body = pc.struct_field(
            pc.extract_regex(decoded, pattern=_BODY_NAMED), "body")
        s = pc.coalesce(body, decoded)
        s = pc.replace_substring_regex(s, pattern=_SCRIPT_STYLE_COMMENT,
                                       replacement="")
        s = pc.replace_substring_regex(s, pattern=_TAG, replacement="")
        for ent, ch in _ENTITIES:
            s = pc.replace_substring(s, pattern=ent, replacement=ch)
        return batch.append_column(self.text_col, s)
