"""range_sorted == Dataset.sort, row for row — dirty strings, ties,
unicode, skew, tiny inputs."""

import pyarrow as pa
import pytest

import ray


def _check(rows, keys):
    from kgforge.stages.rangesort import range_sorted
    tbl = pa.table({k: pa.array([r[i] for r in rows], type=pa.string())
                    for i, k in enumerate(keys)})
    ds = ray.data.from_arrow(tbl).repartition(4).materialize()
    got = range_sorted(ds, keys, num_buckets=8).to_pandas()
    want = ds.sort(keys).to_pandas()
    assert got.reset_index(drop=True).equals(want.reset_index(drop=True))


def test_rangesort_ties_and_common_prefix(ray_session):
    base = "https://kg.example.org/entity/"
    rows = [(f"{base}{i % 37:03d}", f"p{i % 5}", f"o{i % 11}")
            for i in range(1500)]
    _check(rows, ["s", "p", "o"])


def test_rangesort_dirty_strings(ray_session):
    vals = ["", " ", "a", "aa", "a\x01b", "zz", "é-unicode", "éx",
            "same", "same", "same", "<uri>", '"literal with spaces"',
            "0123", "ZZZ", "prefix", "prefixlonger"]
    rows = [(vals[i % len(vals)], vals[(i * 7) % len(vals)],
             vals[(i * 3) % len(vals)]) for i in range(400)]
    _check(rows, ["s", "p", "o"])


def test_rangesort_skewed_single_key(ray_session):
    # all rows share keys[0]: one bucket, still exactly sorted
    rows = [("only", f"p{i % 13:02d}", f"o{999 - i:04d}")
            for i in range(500)]
    _check(rows, ["s", "p", "o"])


def test_rangesort_tiny(ray_session):
    _check([("b", "x", "1"), ("a", "y", "2")], ["s", "p", "o"])
