"""Sinks, CLI orchestrator, and the crash/resume manifest flow."""

import csv
import glob
import os
import shutil

import pytest

from conftest import DOMAIN, catalog_rows

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def cli_workspace(tmp_path, grammar_path):
    header, rows = catalog_rows(80)
    csv_path = tmp_path / "cat.csv"
    with open(csv_path, "w", newline="") as f:
        w = csv.writer(f, delimiter=";")
        w.writerow(header)
        w.writerows(rows)
    shutil.copy(grammar_path, tmp_path / "grammar.ini")
    conf = tmp_path / "conf.ini"
    conf.write_text(
        "[catalog]\n"
        "file = cat.csv\n"
        f"domain = {DOMAIN}\n"
        "delimiter = ;\n"
        "semantics = grammar.ini\n"
        "active = True\n"
        "[off]\n"
        "file = missing.csv\n"
        f"domain = {DOMAIN}\n"
        "delimiter = ,\n"
        "semantics = grammar.ini\n"
        "active = False\n")
    return tmp_path, header, rows


def test_orchestrator_matches_oracle(ray_session, cli_workspace):
    from kgforge.oracle import OracleGrammar, sorted_ntriples
    from kgforge.pipelines.orchestrator import run_sources
    tmp_path, header, rows = cli_workspace
    out = tmp_path / "out"
    written = run_sources(str(tmp_path / "conf.ini"), str(out))
    assert written == [str(out / "catalog")]
    og = OracleGrammar(str(tmp_path / "grammar.ini"), DOMAIN)
    store, define = og.parse_rows(header, rows)
    lines = []
    for f in sorted(glob.glob(str(out / "catalog" / "graph.nt" / "*"))):
        lines += open(f).read().splitlines()
    assert lines == sorted_ntriples(store)          # byte-identical, sorted
    reqs = open(out / "to-define-in-ontology.txt").read().splitlines()
    assert set(reqs) == set(define)
    # parquet mirror rows == nt lines
    import ray.data as rd
    assert rd.read_parquet(
        str(out / "catalog" / "triples.parquet")).count() == len(lines)


def test_orchestrator_union_mode(ray_session, cli_workspace, tmp_path):
    """v1 semantics (A4): two sources into one shared deduped store."""
    from kgforge.pipelines.orchestrator import run_sources
    ws, header, rows = cli_workspace
    conf2 = ws / "conf2.ini"
    conf2.write_text(
        "[s1]\nfile = cat.csv\n"
        f"domain = {DOMAIN}\ndelimiter = ;\nsemantics = grammar.ini\n"
        "active = True\n"
        "[s2]\nfile = cat.csv\n"
        f"domain = {DOMAIN}\ndelimiter = ;\nsemantics = grammar.ini\n"
        "active = True\n")
    out = ws / "out_union"
    written = run_sources(str(conf2), str(out), union_stores=True)
    assert written == [str(out / "union")]
    # same file twice + set semantics → union size == single-source size
    from kgforge.oracle import OracleGrammar
    og = OracleGrammar(str(ws / "grammar.ini"), DOMAIN)
    store, _ = og.parse_rows(header, rows)
    lines = []
    for f in sorted(glob.glob(str(out / "union" / "graph.nt" / "*"))):
        lines += open(f).read().splitlines()
    assert len(lines) == len(store)


def test_partitioned_run_crash_resume(ray_session, tmp_path):
    from kgforge.pipelines.webkg import webkg_triples
    from kgforge.stages.triples import triples_to_terms
    from kgforge.state.manifest import (Manifest, merged_triples,
                                        partitioned_kg_run)
    out = str(tmp_path / "run")
    with pytest.raises(RuntimeError, match="simulated crash"):
        partitioned_kg_run(SF, out, num_partitions=3, fail_after=1)
    assert sorted(Manifest.load(out).completed()) == [0]
    m = partitioned_kg_run(SF, out, num_partitions=3)   # resume
    assert sorted(m.completed()) == [0, 1, 2]
    assert all(r["rows_in"] > 0 and r["triples_out"] > 0
               for r in m.records.values())
    merged = merged_triples(out).map_batches(
        triples_to_terms, batch_format="pyarrow").to_pandas()
    single = webkg_triples(SF, canonicalize=False).map_batches(
        triples_to_terms, batch_format="pyarrow").to_pandas()
    a = set(map(tuple, merged[["s", "p", "o"]].itertuples(index=False)))
    b = set(map(tuple, single[["s", "p", "o"]].itertuples(index=False)))
    assert a == b

    # idempotence: rerun on a complete manifest does nothing
    before = os.path.getmtime(os.path.join(out, "manifest.jsonl"))
    partitioned_kg_run(SF, out, num_partitions=3)
    assert os.path.getmtime(os.path.join(out, "manifest.jsonl")) == before

    # resume with an INCOMPATIBLE layout must refuse, not silently mix
    with pytest.raises(ValueError, match="manifest"):
        partitioned_kg_run(SF, out, num_partitions=5)
    with pytest.raises(ValueError, match="manifest"):
        partitioned_kg_run("/root/testdata/sf0.01", out, num_partitions=3)


def test_partitioned_run_sharded_input(ray_session, tmp_path):
    """Sharded corpus (documents.parquet is a DIRECTORY): each partition
    reads only its shard subset; merged output equals the single-shot
    run on the same corpus."""
    import pandas as pd
    import pyarrow.parquet as pq

    from kgforge.pipelines.webkg import webkg_triples_from_pages, \
        build_prepared_pages
    from kgforge.stages.triples import triples_to_terms
    from kgforge.state.manifest import partitioned_kg_run, merged_triples
    src = tmp_path / "corpus"
    shard_dir = src / "documents.parquet"
    shard_dir.mkdir(parents=True)
    base = pd.read_parquet(f"{SF}/documents.parquet").head(90)
    for k in range(3):
        pq.write_table(
            __import__("pyarrow").Table.from_pandas(
                base.iloc[k * 30:(k + 1) * 30], preserve_index=False),
            shard_dir / f"part-{k}.parquet")
    out = str(tmp_path / "run")
    m = partitioned_kg_run(str(src), out, num_partitions=2)
    assert sorted(m.completed()) == [0, 1]
    assert sum(r["rows_in"] for r in m.records.values()) == 90
    merged = merged_triples(out).map_batches(
        triples_to_terms, batch_format="pyarrow").to_pandas()
    single = webkg_triples_from_pages(
        build_prepared_pages(str(src)), canonicalize=False).map_batches(
        triples_to_terms, batch_format="pyarrow").to_pandas()
    a = set(map(tuple, merged[["s", "p", "o"]].itertuples(index=False)))
    b = set(map(tuple, single[["s", "p", "o"]].itertuples(index=False)))
    assert a == b


def test_orchestrator_ordinal_mode_e2e(ray_session, tmp_path):
    """`ordinal = True` options flag through run_sources: subjects in
    the written graph use the reference's line numbering."""
    from kgforge.pipelines.orchestrator import run_sources
    from kgforge.sinks.ntriples_sink import read_graph_lines
    (tmp_path / "d.csv").write_text("id;name\nx1;Alice\nx2;Bob\n")
    (tmp_path / "conf.ini").write_text(
        f"[d]\nfile = d.csv\ndomain = {DOMAIN}\ndelimiter = ;\n"
        "active = True\nordinal = True\nprefix = row\ntype = line\n")
    out = tmp_path / "out"
    run_sources(str(tmp_path / "conf.ini"), str(out))
    lines = read_graph_lines(str(out / "d"))
    subjects = {l.split(" ", 1)[0] for l in lines}
    assert subjects == {f"<{DOMAIN}row1>", f"<{DOMAIN}row2>"}
    assert any('"Alice"' in l for l in lines)


def test_predicate_partitioned_store(ray_session, tmp_path):
    """S9 replacement: a bound-predicate query over the partitioned
    store reads ONE partition dir and matches the full-scan answer."""
    import glob

    import duckdb

    from kgforge.pipelines.webkg import webkg_triples
    from kgforge.sinks.ntriples_sink import write_graph_partitioned
    triples = webkg_triples(SF).materialize()
    write_graph_partitioned(triples, str(tmp_path))
    parts = glob.glob(f"{tmp_path}/triples_by_predicate/p_key=*")
    assert len(parts) > 3
    lang_dir = f"{tmp_path}/triples_by_predicate/p_key=in_language"
    con = duckdb.connect()
    pruned = con.sql(
        f"SELECT count(*) FROM read_parquet('{lang_dir}/*.parquet') "
        f"WHERE p LIKE '%in_language'").fetchone()[0]
    df = triples.to_pandas()
    full = (df["p"].str.endswith("in_language")).sum()
    assert pruned == full > 0


def test_csv_source_ragged_rows(ray_session, tmp_path):
    from kgforge.sources.csvsource import read_csv_source
    p = tmp_path / "r.csv"
    p.write_text("a;b;c\n1;2;3\n4;5\n6;7;8;9\n")
    df = read_csv_source(str(p), ";").to_pandas()
    assert df["c"].tolist() == ["3", "", "8"]


def test_orchestrator_date_stamp_opt_in(ray_session, tmp_path):
    """`date_stamp = <ISO date>` options flag: every minted type-triple
    subject gains (s, domain+date_created, <date-as-URI>) — the v5/v4
    quirk (URIRef(Literal(TODAY))) preserved. Off by default (reference
    parity: the feature is disabled at its call sites)."""
    from kgforge.pipelines.orchestrator import run_sources
    from kgforge.sinks.ntriples_sink import read_graph_lines
    (tmp_path / "d.csv").write_text("id;name\nx1;Alice\nx2;Bob\n")
    conf = (f"[d]\nfile = d.csv\ndomain = {DOMAIN}\ndelimiter = ;\n"
            "active = True\n")
    (tmp_path / "conf.ini").write_text(conf + "date_stamp = 2026-08-17\n")
    out = tmp_path / "out"
    run_sources(str(tmp_path / "conf.ini"), str(out))
    lines = read_graph_lines(str(out / "d"))
    stamps = [l for l in lines if "date_created" in l]
    assert stamps and all(l.endswith("<2026-08-17> .") for l in stamps)
    subs = {l.split(" ", 1)[0] for l in stamps}
    type_subs = {l.split(" ", 1)[0] for l in lines
                 if "rdf-syntax-ns#type" in l}
    assert subs == type_subs
    # off by default
    (tmp_path / "conf.ini").write_text(conf)
    out2 = tmp_path / "out2"
    run_sources(str(tmp_path / "conf.ini"), str(out2))
    assert not [l for l in read_graph_lines(str(out2 / "d"))
                if "date_created" in l]
