"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported: nothing
here (nor in kgforge/) calls ray.init()/ray.shutdown().

Each ``queries()`` entry is an implemented operator/pipeline from
SURVEY.md §2; ``oracle_sql()`` holds the equivalent DuckDB SQL over the
pre-registered views (region nation customer supplier part orders
lineitem events documents embeddings). Column names match between the
two by construction (shared grammar + shared stringification specs).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship: web-pages → KG pipeline on sf0.001 (build pages from
    documents deterministically, extract text, grammar+mention triples,
    actor-pool entity linking, canonicalize, dedup)."""
    from kgforge.pipelines.webkg import webkg_terms

    return webkg_terms("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from kgforge.pipelines import tabular, webkg

    q: dict[str, Callable[[str], Any]] = {}

    # --- flagship web-KG pipeline (S2,M1,M2,M4,M12,A1,A5 + extensions)
    q["webkg_triples"] = lambda sf: webkg.webkg_terms(sf)

    # --- grammar-driven table KG (S4,M1-M10,M12,A1)
    for t in ("nation", "customer", "part", "supplier"):
        q[f"kg_{t}"] = (lambda sf, _t=t: tabular.table_kg_terms(sf, _t))

    # --- ontology-requirements side output (S7,A2)
    q["kg_requirements_part"] = lambda sf: tabular.table_requirements(sf, "part")

    return q


def oracle_sql() -> dict[str, str]:
    from kgforge.pipelines import tabular, webkg

    o: dict[str, str] = {}
    o["webkg_triples"] = webkg.webkg_oracle_sql()
    for t in ("nation", "customer", "part", "supplier"):
        o[f"kg_{t}"] = tabular.table_kg_sql(t)
    o["kg_requirements_part"] = tabular.table_requirements_sql("part")
    return o
