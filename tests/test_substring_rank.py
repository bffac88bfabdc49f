"""Session-3 operators: substring-level duplicated-gram coverage,
repetition signals, PII scrub, distributed row numbering. Planted-case
semantics + parallelism independence; the DuckDB hash gates run in
scripts/gate_check.py / the driver."""

import duckdb
import pandas as pd
import pyarrow as pa

SF = "/root/testdata/sf0.001"


def test_dup_gram_coverage_planted(ray_session, tmp_path):
    from kgforge.ops.substring import dup_gram_coverage
    passage = "the quick brown fox jumps over the lazy dog"
    docs = pd.DataFrame({
        "doc_id": [0, 1, 2, 3],
        "text": [
            f"alpha beta {passage} gamma delta",
            f"unrelated words here {passage} trailing tail tokens",
            "completely different text with no shared five gram runs",
            "tiny doc",  # < n tokens -> zero grams
        ],
    })
    docs.to_parquet(tmp_path / "documents.parquet")
    out = (dup_gram_coverage(str(tmp_path), n=5).to_pandas()
           .set_index("doc_id").sort_index())
    # the 9-token shared passage has 5 five-gram positions in each doc
    assert out.loc[0, "n_dup_grams"] == 5
    assert out.loc[1, "n_dup_grams"] == 5
    assert out.loc[2, "n_dup_grams"] == 0
    assert out.loc[3, "n_grams"] == 0 and out.loc[3, "n_dup_grams"] == 0
    assert out.loc[0, "n_grams"] == 13 - 4  # 13 tokens


def test_dup_gram_within_doc_repeat_not_counted(ray_session, tmp_path):
    """A gram repeated only WITHIN one doc is not cross-doc duplication."""
    from kgforge.ops.substring import dup_gram_coverage
    rep = "one two three four five"
    docs = pd.DataFrame({"doc_id": [0, 1],
                         "text": [f"{rep} x {rep}",
                                  "nothing shared with that doc at all"]})
    docs.to_parquet(tmp_path / "documents.parquet")
    out = (dup_gram_coverage(str(tmp_path), n=5).to_pandas()
           .set_index("doc_id"))
    assert out.loc[0, "n_dup_grams"] == 0
    assert out.loc[1, "n_dup_grams"] == 0


def test_repetition_stats_hand_case(ray_session, tmp_path):
    from kgforge.ops.text import repetition_stats
    docs = pd.DataFrame({"doc_id": [0, 1],
                         "text": ["a a a b", "x"]})
    docs.to_parquet(tmp_path / "documents.parquet")
    out = (repetition_stats(str(tmp_path)).to_pandas()
           .set_index("doc_id").sort_index())
    assert out.loc[0].tolist() == [4, 2, 3, 2]  # "a a" twice
    assert out.loc[1].tolist() == [1, 1, 1, 0]  # no 2-grams


def test_pii_scrub_patterns(ray_session, tmp_path):
    from kgforge.ops.text import pii_scrub
    rows = pd.DataFrame({
        "c_custkey": [1, 2, 3],
        "c_name": ["mail me at bob@example.com or 12345678",
                   "short 12345 digits stay",
                   "clean name"],
    })
    rows.to_parquet(tmp_path / "customer.parquet")
    out = (pii_scrub(str(tmp_path)).to_pandas()
           .set_index("c_custkey").sort_index())
    assert out.loc[1, "c_name_scrubbed"] == "mail me at [EMAIL] or [ID]"
    assert out.loc[1, "n_redactions"] == 2
    assert out.loc[2, "c_name_scrubbed"] == "short 12345 digits stay"
    assert out.loc[2, "n_redactions"] == 0
    assert out.loc[3, "n_redactions"] == 0


def test_global_row_number_is_dense_permutation(ray_session):
    import ray
    from kgforge.ops.rank import global_row_number
    ids = list(range(0, 400, 3))
    ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(ids, pa.int64())}))
    out = global_row_number(ds.repartition(7), "doc_id").to_pandas()
    assert sorted(out["pos"]) == list(range(len(ids)))
    assert set(out["doc_id"]) == set(ids)


def test_global_row_number_parallelism_independent(ray_session):
    import ray
    from kgforge.ops.rank import global_row_number
    t = pa.table({"doc_id": pa.array(range(123), pa.int64())})
    a = (global_row_number(ray.data.from_arrow(t).repartition(2),
                           "doc_id").to_pandas()
         .sort_values("doc_id").reset_index(drop=True))
    b = (global_row_number(ray.data.from_arrow(t).repartition(11),
                           "doc_id").to_pandas()
         .sort_values("doc_id").reset_index(drop=True))
    assert a.equals(b)


def test_corpus_shuffle_matches_sql_rank(ray_session, tmp_path):
    from kgforge.ops.rank import corpus_shuffle, corpus_shuffle_sql
    docs = pd.DataFrame({"doc_id": range(57),
                         "text": ["w"] * 57})
    docs.to_parquet(tmp_path / "documents.parquet")
    got = (corpus_shuffle(str(tmp_path), n_shards=4).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{tmp_path}/documents.parquet')")
    want = (con.sql(corpus_shuffle_sql(n_shards=4)).df()
            .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_global_prefix_sum_matches_sorted_cumsum(ray_session):
    import numpy as np
    import ray
    from kgforge.ops.rank import _khash, global_prefix_sum
    ids = np.arange(0, 300, 2)
    vals = (ids * 7 + 3) % 41
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "v": pa.array(vals, pa.int64())})).repartition(5)
    out = (global_prefix_sum(ds, "doc_id", "v").to_pandas()
           .sort_values("pos").reset_index(drop=True))
    order = np.lexsort((ids, _khash(ids)))
    expect = np.concatenate(([0], np.cumsum(vals[order])[:-1]))
    assert out["doc_id"].tolist() == ids[order].tolist()
    assert out["offset"].tolist() == expect.tolist()
    assert out["pos"].tolist() == list(range(len(ids)))


def test_token_budget_shards_pack_greedily(ray_session, tmp_path):
    from kgforge.ops.rank import token_budget_shards
    docs = pd.DataFrame({"doc_id": range(40),
                         "text": ["tok " * 9 + "tok"] * 40})  # 10 tokens
    docs.to_parquet(tmp_path / "documents.parquet")
    out = (token_budget_shards(str(tmp_path), budget=25).to_pandas()
           .sort_values("pos").reset_index(drop=True))
    # 10-token docs, budget 25: offsets 0,10,20 -> shard 0; 30,40 -> 1 ...
    assert out["tok_offset"].tolist() == [i * 10 for i in range(40)]
    assert (out["shard"] == out["tok_offset"] // 25).all()
    # shard ids are non-decreasing along the permutation
    assert (out["shard"].diff().fillna(0) >= 0).all()
