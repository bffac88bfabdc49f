"""Shared fixtures. Ray is initialised ONCE per pytest session."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def ray_session():
    import ray
    from ray.data import DataContext

    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False
    # small-session tuning: default min_parallelism (200) shreds tiny test
    # datasets into hundreds of blocks, and the hash-shuffle aggregator
    # pool (64 actors, 300s waits) dwarfs a 4-CPU session
    ctx.min_parallelism = 8
    ctx.max_hash_shuffle_aggregators = 4
    yield ray
    ray.shutdown()


def catalog_rows(n: int = 120) -> tuple[list[str], list[list[str]]]:
    """Deterministic conformance rows for tests/fixtures/grammar.ini —
    dirty chars, empties, whitespace-only cells, map hits + misses,
    multi-treatment columns, an unbound column. Pure arithmetic on the
    row index (seedless determinism, parallelism-independent)."""
    header = ["PNR", "IPPN", "CSN", "SRV", "VAPMOV", "EFY", "NSC",
              "SUBJM", "DESC", "QTY", "WEIGHT", "FIRST_DATE", "MOI",
              "UNBOUND"]
    dirty = ["", " ", "a-b", 'q"q', "c/d\\e", "(x),y", "<z>|{w}",
             "a^b#c$d", "e*f.g`h", "i+j=k%l", "don't"]
    nations = ["FIF", "NON", "SWE", "GED", "FRA", "XXX", "fif", "Non"]
    rows = []
    for i in range(n):
        pnr = f"S000N{i:05d}{dirty[i % len(dirty)]}"
        ippn = f"C{i % 37:04d}E{i % 7:03d}"
        csn = "" if i % 10 == 3 else ("   " if i % 20 == 7 else f"CS-{i % 53:03d}")
        srv = nations[i % len(nations)]
        vapmov = ["AEX", "BNY", "FXZ", "gAq", "ZZZ", "N"][i % 6]
        efy = f"{i % 9999:04d}{(i * 7) % 9999:04d}"
        nsc = f"{i % 97:04d}"
        subjm = nations[(i + 3) % len(nations)]
        desc = ["wide body panel", "bolt, m6 (steel)", 'bracket "L"',
                "câble écranté", "", "tab\tsep"][i % 6]
        qty = str(i % 500)
        weight = f"{(i % 1000) / 7:.3f}"
        fdate = f"2024-{(i % 12) + 1:02d}-{(i % 28) + 1:02d}"
        moi = f"junk{i}"
        unbound = f"unused{i}"
        rows.append([pnr, ippn, csn, srv, vapmov, efy, nsc, subjm, desc,
                     qty, weight, fdate, moi, unbound])
    return header, rows


@pytest.fixture(scope="session")
def catalog():
    return catalog_rows()


@pytest.fixture(scope="session")
def grammar_path():
    return os.path.join(os.path.dirname(__file__), "fixtures", "grammar.ini")


DOMAIN = "https://www.example.org/rdf/test/"
