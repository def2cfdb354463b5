"""Training-data ops: determinism and structural checks at sf0.001."""

import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"

pytestmark = pytest.mark.usefixtures("ray_session")


def test_exact_dedup_matches_pandas():
    from html_extract import dataops as D

    got = D.exact_dedup(SF).to_pandas().sort_values("doc_id", ignore_index=True)
    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    want = (
        docs.groupby("text")["doc_id"].min().sort_values().reset_index(drop=True)
    )
    assert got["doc_id"].tolist() == want.tolist()


def test_token_counts_match_split():
    from html_extract import dataops as D

    got = D.token_counts(SF).to_pandas().set_index("doc_id")["n_tokens"]
    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    for did, text in zip(docs["doc_id"].head(50), docs["text"].head(50)):
        assert got[did] == len(text.split())


def test_minhash_finds_near_duplicates(tmp_path):
    """Plant a near-duplicate pair and check LSH surfaces it."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from html_extract import dataops as D

    base = " ".join(f"word{i}" for i in range(200))
    near = base.replace("word100", "changed", 1)
    other = " ".join(f"other{i}" for i in range(200))
    tbl = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array([base, near, other]),
        }
    )
    pq.write_table(tbl, tmp_path / "documents.parquet")
    pairs = D.minhash_candidates(str(tmp_path))
    assert len(pairs) >= 1
    assert (1, 2) in set(zip(pairs["a"], pairs["b"]))
    clusters = D.minhash_dedup(str(tmp_path))
    cmap = dict(zip(clusters["doc_id"], clusters["cluster_id"]))
    assert cmap[1] == cmap[2]
    assert cmap[3] != cmap[1]


def test_simhash_deterministic_and_close_for_near_dups(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from html_extract import dataops as D

    base = "alpha beta gamma delta epsilon zeta eta theta " * 10
    near = base.replace("zeta", "zeta2", 1)
    tbl = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": pa.array([base, near]),
        }
    )
    pq.write_table(tbl, tmp_path / "documents.parquet")
    fp = D.simhash_fingerprints(str(tmp_path)).to_pandas()
    a, b = (int(x, 16) for x in fp.sort_values("doc_id")["simhash"])
    assert bin(a ^ b).count("1") <= 16  # near-dups are close in hamming space
    fp2 = D.simhash_fingerprints(str(tmp_path)).to_pandas()
    assert fp.equals(fp2)


def test_ann_topk_self_is_rank_one():
    from html_extract import dataops as D

    topk = D.ann_topk(SF)
    firsts = topk[topk["rank"] == 1]
    assert set(firsts["query_id"]) == {0, 1, 2, 3, 4}
    # a vector's nearest neighbor is itself
    assert (firsts["query_id"] == firsts["neighbor_id"]).all()


def test_langid_runs_and_covers_all_docs():
    from html_extract import dataops as D

    out = D.langid(SF).to_pandas()
    assert len(out) == 500
    assert set(out["lang_pred"]) <= {"en", "de", "es", "fr", "zh", "und"}


def test_media_features_deterministic():
    from html_extract.multimodal import MediaDecodeActor, synthesize_payload
    import pyarrow as pa

    actor = MediaDecodeActor()
    t = pa.table({"asset_ref": ["mem://a/1", "mem://a/2"]})
    r1 = actor(t)
    r2 = actor(t)
    assert r1.equals(r2)
    assert len(r1["features"][0].as_py()) == 32
    with pytest.raises(NotImplementedError):
        MediaDecodeActor(strict=True)._features(synthesize_payload("x"))


def test_orders_by_nation_matches_pandas():
    from html_extract import dataops as D

    got = (
        D.orders_by_nation(SF)
        .to_pandas()
        .sort_values("n_name", ignore_index=True)
    )
    orders = pd.read_parquet(f"{SF}/orders.parquet", columns=["o_custkey"])
    cust = pd.read_parquet(f"{SF}/customer.parquet", columns=["c_custkey", "c_nationkey"])
    nation = pd.read_parquet(f"{SF}/nation.parquet", columns=["n_nationkey", "n_name"])
    want = (
        orders.merge(cust, left_on="o_custkey", right_on="c_custkey")
        .merge(nation, left_on="c_nationkey", right_on="n_nationkey")
        .groupby("n_name")
        .size()
        .reset_index(name="n_orders")
        .sort_values("n_name", ignore_index=True)
    )
    assert got["n_name"].tolist() == want["n_name"].tolist()
    assert got["n_orders"].tolist() == want["n_orders"].tolist()


def test_embedding_near_dups_finds_planted_pair(tmp_path):
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from html_extract import dataops as D

    rng = np.random.RandomState(7)
    M = rng.normal(size=(20, 16)).astype(np.float32)
    M[5] = M[3] + rng.normal(scale=1e-3, size=16)  # planted near-dup
    tbl = pa.table(
        {
            "vec_id": pa.array(range(20), pa.int64()),
            "embedding": pa.array([list(map(float, r)) for r in M], pa.list_(pa.float32())),
            "label": pa.array([0] * 20, pa.int32()),
        }
    )
    pq.write_table(tbl, tmp_path / "embeddings.parquet")
    pairs = D.embedding_near_dups(str(tmp_path), threshold_pct=95)
    assert (3, 5) in set(zip(pairs["a"], pairs["b"]))


def test_ann_lsh_structure_and_self_hit():
    from html_extract import dataops as D

    out = D.ann_topk_lsh(SF)
    assert set(out.columns) == {"query_id", "neighbor_id", "rank"}
    firsts = out[out["rank"] == 1]
    # a query is always in its own bucket -> self is its top hit
    assert (firsts["query_id"] == firsts["neighbor_id"]).all()
    # and the result is deterministic
    assert out.equals(D.ann_topk_lsh(SF))
