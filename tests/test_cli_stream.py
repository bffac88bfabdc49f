"""CLI result streaming (kgforge/cli.py): SPARQL statement results go
to CSV via chunked ``iter_batches`` — never a full driver collect —
and ``--load`` bulk-ingests RDF into a queryable store."""

from __future__ import annotations

import os

import pandas as pd
import pytest

REF_TTL = "/root/reference/csv2rdf/tests_ttl"


def test_write_result_csv_streams_multiblock(ray_session, tmp_path):
    """A multi-block result writes correctly and the writer provably
    never calls a full-collect API on the Dataset."""
    import ray.data

    from kgforge.cli import write_result_csv

    ds = ray.data.range(1000).map_batches(
        lambda b: {"x": b["id"], "y": b["id"] * 2},
        batch_format="numpy").repartition(8)

    def boom(*a, **k):  # any full collect fails the test
        raise AssertionError("full driver collect attempted")

    ds.to_pandas = boom
    ds.take_all = boom
    path = str(tmp_path / "res.csv")
    n = write_result_csv(ds, path)
    assert n == 1000
    df = pd.read_csv(path)
    assert len(df) == 1000
    assert sorted(df.columns) == ["x", "y"]
    assert df["y"].sum() == 2 * df["x"].sum()


def test_write_result_csv_empty(ray_session, tmp_path):
    import pyarrow as pa
    import ray.data

    from kgforge.cli import write_result_csv

    ds = ray.data.from_arrow(
        pa.schema([("a", pa.string()), ("b", pa.int64())]).empty_table())
    path = str(tmp_path / "empty.csv")
    assert write_result_csv(ds, path) == 0
    df = pd.read_csv(path)
    assert len(df) == 0 and list(df.columns) == ["a", "b"]


def test_cli_load_then_query(ray_session, tmp_path):
    """--load ingests the reference's .ttl fixtures, then --query
    answers from the resulting store."""
    from kgforge.cli import main

    store = str(tmp_path / "store")
    rc = main(["--load", os.path.join(REF_TTL, "csv2rdf.ttl"),
               os.path.join(REF_TTL, "test1.ttl"), "--store", store])
    assert rc == 0
    out = str(tmp_path / "out")
    rc = main(["--query",
               "PREFIX c: <https://github.com/orey/data/csv2rdf.ttl#> "
               "SELECT ?f WHERE { ?f a c:csvfile }",
               "--store", store, "-o", out])
    assert rc == 0
    df = pd.read_csv(os.path.join(out, "statement1_select.csv"))
    assert df["f"].tolist() == ["http://my.company.com/rdf#file1"]


def test_cli_arg_validation(ray_session):
    from kgforge.cli import main

    with pytest.raises(SystemExit):
        main(["--load", "x.ttl"])  # --load needs --store
    with pytest.raises(SystemExit):
        main(["--load", "x.ttl", "--store", "s", "--query", "SELECT"])
    with pytest.raises(SystemExit):
        main(["--store", "s"])  # --store alone


def test_cli_delete_preview_and_apply(ray_session, tmp_path):
    """DELETE via the CLI: preview without --apply-updates (store
    unchanged), mutate with it."""
    import pyarrow as pa
    import ray.data

    from kgforge.cli import main
    from kgforge.sinks.ntriples_sink import write_graph_partitioned
    from kgforge.sinks.store_query import query_triples

    store = str(tmp_path / "store")
    os.makedirs(store)
    write_graph_partitioned(ray.data.from_arrow(pa.table({
        "s": ["http://e/a", "http://e/b"],
        "p": ["http://e/w", "http://e/w"],
        "o": ['"1"', '"2"'],
    })), store)
    q = 'DELETE DATA { <http://e/a> <http://e/w> "1" }'
    out1 = str(tmp_path / "o1")
    assert main(["--query", q, "--store", store, "--out", out1]) == 0
    assert query_triples(store).count() == 2          # preview only
    prev = pd.read_csv(os.path.join(out1, "statement1_delete.csv"))
    assert len(prev) == 1
    out2 = str(tmp_path / "o2")
    assert main(["--query", q, "--store", store, "--out", out2,
                 "--apply-updates"]) == 0
    assert query_triples(store).count() == 1
