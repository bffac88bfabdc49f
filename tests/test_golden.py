"""Golden-file drift guard: the conformance catalog's triple set is
frozen; any semantic change to the rule engine or oracle across rounds
must be a conscious golden-file update, never an accident."""

import os

from kgforge.oracle import OracleGrammar, sorted_ntriples
from conftest import DOMAIN

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


def test_oracle_matches_golden(catalog, grammar_path):
    header, rows = catalog
    store, define = OracleGrammar(grammar_path, DOMAIN).parse_rows(header, rows)
    want = open(os.path.join(GOLDEN, "catalog.nt")).read().splitlines()
    assert sorted_ntriples(store) == want
    want_req = open(os.path.join(GOLDEN,
                                 "ontology-requirements.txt")).read().splitlines()
    assert sorted(define) == want_req
