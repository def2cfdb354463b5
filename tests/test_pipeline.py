"""End-to-end Ray Data pipeline tests at sf0.001, including the
span-equality invariant (Ray output vs single-process oracle) and
checkpoint resume."""

import os

import pyarrow.compute as pc
import pytest

SF_DIR = "/root/testdata/sf0.001"

pytestmark = pytest.mark.usefixtures("ray_session")


def test_flagship_extraction_runs(tmp_path):
    from html_extract import pipeline as P

    ds = P.extracted_dataset(SF_DIR, batch_size=64)
    rows = ds.take(10)
    assert len(rows) == 10
    for r in rows:
        assert r["doc_id"].startswith("doc-")
        assert r["ok"]
        assert isinstance(r["spans"], list) and len(r["spans"]) > 0
        orders = [s["order"] for s in r["spans"]]
        assert orders == list(range(len(orders)))


def test_span_equality_vs_oracle():
    """north-rule invariant: per-document span-sequence equality
    (kind, text, media_ref, order) of the Ray pipeline vs the
    single-process oracle."""
    from html_extract import pipeline as P
    from html_extract.extract import process_document
    from html_extract.htmlgen import make_interleaved_spans
    import pyarrow.parquet as pq

    ds = P.extracted_dataset(SF_DIR, batch_size=32)
    got = {r["doc_id"]: r["spans"] for r in ds.take_all()}
    src = pq.read_table(P.documents_path(SF_DIR), columns=["doc_id", "text"])
    assert len(got) == src.num_rows
    checked = 0
    for did, text in zip(
        src["doc_id"].to_pylist(), src["text"].to_pylist()
    ):
        doc_id = f"doc-{did:012d}"
        spans_in = make_interleaved_spans(doc_id, text or "")
        oracle, _ = process_document(doc_id, [(k, t, m) for k, t, m, _ in spans_in])
        ray_spans = [
            (s["kind"], s["text"], s["media_ref"], s["order"])
            for s in got[doc_id]
        ]
        assert ray_spans == oracle, f"span mismatch for {doc_id}"
        checked += 1
    assert checked == src.num_rows


def test_sharded_run_and_resume(tmp_path):
    from html_extract import pipeline as P

    out_dir = str(tmp_path / "out")
    manifests = P.run_pipeline(SF_DIR, out_dir, num_shards=2, batch_size=64)
    assert len(manifests) == 2
    total = sum(m["row_count"] for m in manifests)
    assert total == 500  # sf0.001 documents rows
    assert all(m["failed_docs"] == 0 for m in manifests)
    assert os.path.exists(os.path.join(out_dir, "shard=0"))
    assert os.path.exists(os.path.join(out_dir, "_manifests/shard-1.json"))
    # resume: no recompute (manifests returned unchanged, fast)
    again = P.run_pipeline(SF_DIR, out_dir, num_shards=2)
    assert [m["completed_at"] for m in again] == [
        m["completed_at"] for m in manifests
    ]


def test_size_histogram():
    from html_extract import pipeline as P

    ds = P.interleaved_dataset(SF_DIR)
    hist = P.size_histogram(ds)
    assert sum(hist.values()) == 500
    # corpus pages are multi-KB
    assert hist["256"] == 0


def test_spans_flat_projection():
    from html_extract import pipeline as P

    flat = P.spans_flat(P.extracted_dataset(SF_DIR))
    t = flat.take(5)
    assert {"doc_id", "kind", "text", "media_ref", "ord"} <= set(t[0].keys())


def test_conformance_diff_empty():
    """At-scale span-equality audit: engine join oracle -> no mismatches."""
    from html_extract import pipeline as P

    diff = P.conformance_diff(SF_DIR, num_partitions=4)
    assert diff.count() == 0


def test_reserialized_roundtrip_stable():
    from html_extract import pipeline as P
    from html_extract.parser import parse
    from html_extract.serializer import serialize

    rows = P.reserialized(SF_DIR).take(5)
    for r in rows:
        # serialize(parse(.)) is a fixed point on already-serialized HTML
        assert serialize(parse(r["html"]).document) == r["html"]


def test_pretty_html_stage():
    import re

    from html_extract import pipeline as P
    from html_extract.parser import parse
    from html_extract.serializer import serialize

    rows = P.pretty_html(SF_DIR).take(5)
    ws = re.compile(r"\s+")
    for r in rows:
        # pretty output is still a parseable document whose rendered
        # (whitespace-collapsed) text equals a replain-serialize of it
        doc = parse(r["html"]).document
        again = serialize(
            parse(serialize(doc)).document,
            reformat_whitespace=True,
        )
        # idempotence: pretty(parse(pretty(x))) == pretty(x)
        assert again == r["html"], r["doc_id"]


def test_dedup_output_guard():
    import ray.data as rd
    from html_extract import pipeline as P

    ds = rd.from_items(
        [{"doc_id": "a", "v": 1}, {"doc_id": "a", "v": 1}, {"doc_id": "b", "v": 2}]
    )
    out = P.dedup_output(ds).to_pandas()
    assert sorted(out["doc_id"]) == ["a", "b"]


def test_plain_adapter_mode():
    from html_extract import pipeline as P

    ds = P.interleaved_dataset(SF_DIR, mode="plain")
    row = ds.take(1)[0]
    assert len(row["spans"]) == 1
    assert row["spans"][0]["kind"] == "html"


def test_multifile_corpus_file_level_sharding(tmp_path):
    """100TB layout: documents/ dir of part files; shards read disjoint
    file subsets and the union covers everything exactly once."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from html_extract import pipeline as P

    d = tmp_path / "documents"
    d.mkdir()
    for part in range(4):
        tbl = pa.table(
            {
                "doc_id": pa.array(range(part * 10, part * 10 + 10), pa.int64()),
                "text": pa.array([f"doc {i} words here" for i in range(10)]),
            }
        )
        pq.write_table(tbl, d / f"part-{part}.parquet")
    seen = []
    for s in range(2):
        ds = P.load_documents(str(tmp_path), shard=s, num_shards=2)
        seen.extend(r["doc_id"] for r in ds.take_all())
    assert sorted(seen) == sorted(
        list(range(0, 10)) + list(range(10, 20)) + list(range(20, 30)) + list(range(30, 40))
    )
    assert len(seen) == len(set(seen))


def test_golden_span_fingerprints_frozen():
    """Frozen-oracle check: the full Ray pipeline's span fingerprints
    at sf0.001 must match the committed golden parquet byte-for-byte.
    Regenerate ONLY via `python tools/gen_golden_spans.py --write`
    after an intentional extraction-semantics change."""
    import os

    import pandas as pd

    from html_extract import pipeline as P

    golden_path = os.path.join(
        os.path.dirname(__file__), "golden", "span_fp_sf0.001.parquet"
    )
    golden = pd.read_parquet(golden_path)
    got = (
        P.span_fingerprints(P.extracted_dataset("/root/testdata/sf0.001"))
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    assert got["doc_id"].tolist() == golden["doc_id"].tolist()
    mism = got[got["fp"] != golden["fp"]]
    assert len(mism) == 0, f"{len(mism)} fingerprint mismatches: {mism.head()}"


def test_resume_recomputes_on_corrupt_manifest(tmp_path):
    """A torn/corrupt manifest JSON (crash mid-write) must mark the
    shard incomplete and recompute it, not crash the resume."""
    import json
    import os

    from html_extract import pipeline as P

    out = str(tmp_path / "out")
    m1 = P.run_pipeline("/root/testdata/sf0.001", out, num_shards=2)
    assert len(m1) == 2
    mpath = os.path.join(out, "_manifests", "shard-1.json")
    with open(mpath, "w") as f:
        f.write('{"truncated": ')  # torn write
    m2 = P.run_pipeline("/root/testdata/sf0.001", out, num_shards=2)
    assert len(m2) == 2
    with open(mpath) as f:
        fixed = json.load(f)
    assert fixed["row_count"] == m1[1]["row_count"]
    # shard 0 untouched (same completion stamp), shard 1 recomputed
    assert m2[0]["completed_at"] == m1[0]["completed_at"]
    assert m2[1]["completed_at"] != m1[1]["completed_at"]


def test_multifile_run_pipeline_end_to_end(tmp_path):
    """documents/ directory of part files through the FULL run_pipeline
    (shard manifests + output parquet), not just load_documents."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from html_extract import pipeline as P

    src = pd.read_parquet(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"]
    ).head(120)
    ddir = tmp_path / "documents"
    ddir.mkdir()
    for i in range(6):
        part = src.iloc[i * 20 : (i + 1) * 20]
        pq.write_table(pa.Table.from_pandas(part, preserve_index=False),
                       ddir / f"part-{i}.parquet")

    out = str(tmp_path / "out")
    manifests = P.run_pipeline(str(tmp_path), out, num_shards=3)
    assert len(manifests) == 3
    total = sum(m["row_count"] for m in manifests)
    assert total == 120
    import glob

    import ray.data as rd

    got = sum(
        rd.read_parquet(d).count() for d in sorted(glob.glob(out + "/shard=*"))
    )
    assert got == 120


def test_pathological_document_skew_isolation(tmp_path):
    """One enormous/deep document among many small ones: the size-cut
    adapter must isolate it into its own block(s) and the pipeline must
    produce correct spans for every doc (north-rule skew handling)."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from html_extract import pipeline as P

    small = ["plain words " * 30] * 50
    # a deep + wide monster (~1.5 MB of text after page synthesis)
    monster = ("nested content with words " * 20 + "\n\n") * 800
    texts = small[:25] + [monster] + small[25:]
    ids = list(range(len(texts)))
    pq.write_table(
        pa.table({"doc_id": pa.array(ids, pa.int64()), "text": pa.array(texts)}),
        tmp_path / "documents.parquet",
    )
    ds = P.extracted_dataset(str(tmp_path), batch_size=16)
    out = ds.to_pandas()
    assert len(out) == 51
    assert out["ok"].all()
    # the monster doc produced spans too (not dropped/poisoned)
    monster_row = out[out["doc_id"] == "doc-000000000025"]
    assert len(monster_row) == 1
    assert len(monster_row.iloc[0]["spans"]) >= 5


def test_cli_job_submit_surface(tmp_path):
    """The `python -m html_extract` CLI — the `ray job submit`
    entrypoint surface — runs end-to-end in a fresh process: extract
    writes sharded output + manifests; parse/serialize work over
    stdin (incl. the round-3 --pretty mode)."""
    import json
    import subprocess
    import sys

    out_dir = tmp_path / "out"
    r = subprocess.run(
        [
            sys.executable, "-m", "html_extract", "extract",
            "--sf", SF_DIR, "--out", str(out_dir), "--shards", "2",
        ],
        capture_output=True, text=True, timeout=300,
        env={**__import__("os").environ, "RAY_ADDRESS": "local"},
    )
    assert r.returncode == 0, r.stderr[-2000:]
    manifests = json.loads(r.stdout)
    assert len(manifests) == 2
    assert sum(m["row_count"] for m in manifests) == 500
    assert (out_dir / "_manifests").is_dir()

    r = subprocess.run(
        [sys.executable, "-m", "html_extract", "parse"],
        input="<p>hello <img src=x></p>",
        capture_output=True, text=True, timeout=120,
    )
    assert r.returncode == 0
    rows = [json.loads(l) for l in r.stdout.strip().splitlines()]
    assert any(row["kind"] == "media" and row["media_ref"] == "x" for row in rows)

    r = subprocess.run(
        [sys.executable, "-m", "html_extract", "serialize", "--pretty"],
        input="<div><p> x </p></div>",
        capture_output=True, text=True, timeout=120,
    )
    assert r.returncode == 0
    assert "\n" in r.stdout and "<p>x</p>" in r.stdout
