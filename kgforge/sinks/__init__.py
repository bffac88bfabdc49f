"""kgforge.sinks — graph writers + the output-format registry.

The reference's author left "TODO Add more output formats"
(csv2rdf-v5.py:148); this registry is that extension point: a format is
``writer(triples: ray.data.Dataset, out_dir: str, domain: str) -> None``
over the COLUMNAR triple schema, registered by name and selectable per
run (``pipelines.orchestrator.run_sources(formats=...)``). Built-ins
lazy-load so importing the package stays cheap."""

from __future__ import annotations

from typing import Callable

_SinkWriter = Callable[["object", str, str], None]
_FORMATS: dict[str, _SinkWriter] = {}


def register_sink_format(name: str, writer: _SinkWriter | None = None):
    """``register_sink_format("tsv", fn)`` or as a decorator:
    ``@register_sink_format("tsv")``."""
    if writer is not None:
        _FORMATS[name] = writer
        return writer

    def deco(fn):
        _FORMATS[name] = fn
        return fn
    return deco


def _nt(triples, out_dir: str, domain: str) -> None:
    from .ntriples_sink import write_graph
    write_graph(triples, out_dir)


def _ttl(triples, out_dir: str, domain: str) -> None:
    from .turtle_sink import write_graph_turtle
    write_graph_turtle(triples, out_dir, domain)


def _jsonld(triples, out_dir: str, domain: str) -> None:
    from .jsonld_sink import write_graph_jsonld
    write_graph_jsonld(triples, out_dir, domain)


def _rdfxml(triples, out_dir: str, domain: str) -> None:
    from .rdfxml_sink import write_graph_rdfxml
    write_graph_rdfxml(triples, out_dir, domain)


def sink_format(name: str) -> _SinkWriter:
    builtin = {"nt": _nt, "ttl": _ttl, "jsonld": _jsonld,
               "rdfxml": _rdfxml}
    if name in _FORMATS:
        return _FORMATS[name]
    if name in builtin:
        return builtin[name]
    raise KeyError(
        f"unknown sink format {name!r}; registered: "
        f"{sorted(set(_FORMATS) | set(builtin))}")
