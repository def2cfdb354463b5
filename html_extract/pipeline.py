"""Ray Data pipeline: read -> adapt -> (skew-aware blocks) -> parse/extract
-> write + per-shard lineage manifests, checkpoint-resumable.

Stage classification follows SURVEY.md §7.2: the parse/extract stage is
an actor pool (per-worker compiled tables: entity dict, tag sets,
heuristic constants, §2.4); everything crossing a stage boundary is
Arrow; the hot path is map-only — no shuffle is needed to extract.

Scale notes (the 100 TB design):
- column pruning at the read (only doc_id/text leave storage for the
  adapter path; a real interleaved corpus reads doc_id/spans).
- skew defusal: the adapter *yields* sub-batches cut by cumulative
  html-byte size, so pathological documents land in small blocks and
  never stall a whole 128 MiB block behind one 10 MB page
  (north-rule "repartition by doc-size histogram" expressed the
  streaming-native way: block shaping at source, no extra pass).
- resume: the corpus is sharded by hash(doc_id) % num_shards; each
  shard writes to its own directory via a temp-dir + atomic rename,
  then appends a manifest JSON.  A rerun skips shards whose manifest
  exists — per-partition lineage + checkpoint resume without a shuffle.
"""

import json
import os
import time

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from .extract import process_document
from .htmlgen import make_interleaved_spans

SPAN_IN_T = pa.struct(
    [
        ("kind", pa.string()),
        ("text", pa.string()),
        ("media_ref", pa.string()),
        ("offset", pa.int32()),
    ]
)
SPAN_OUT_T = pa.struct(
    [
        ("kind", pa.string()),
        ("text", pa.string()),
        ("media_ref", pa.string()),
        ("order", pa.int32()),
    ]
)
META_T = pa.struct(
    [
        ("encoding", pa.string()),
        ("quirks_mode", pa.int8()),
        ("n_errors", pa.int32()),
        ("n_nodes", pa.int32()),
        ("parse_ns", pa.int64()),
    ]
)

# target cumulative html bytes per yielded sub-batch from the adapter;
# sized so batch x actor-pool concurrency stays far under worker heap
ADAPTER_SLICE_BYTES = 4 << 20


def documents_path(sf_dir: str) -> str:
    return os.path.join(sf_dir, "documents.parquet")


def _document_files(sf_dir: str):
    """The corpus is either one parquet file (driver testdata) or a
    directory of part files (the 100 TB layout)."""
    single = documents_path(sf_dir)
    if os.path.isfile(single):
        return [single]
    as_dir = os.path.join(sf_dir, "documents")
    if os.path.isdir(as_dir):
        import glob as _glob

        return sorted(_glob.glob(os.path.join(as_dir, "*.parquet")))
    raise FileNotFoundError(single)


def load_documents(sf_dir: str, shard=None, num_shards=None) -> rd.Dataset:
    """Driver documents table, pruned to the two columns the adapter needs.

    Sharding: with a multi-file corpus each shard reads ONLY its own
    file subset (no re-reading); a single-file corpus falls back to a
    doc_id-hash filter.
    """
    import ray

    files = _document_files(sf_dir)
    if shard is not None and num_shards and len(files) >= num_shards:
        files = files[shard::num_shards]
        shard = None  # file-level sharding replaces the hash filter
    total = sum(os.path.getsize(f) for f in files)
    kwargs = {}
    if total <= (1 << 30):
        # small input: cap read blocks at the CPU count — Ray's ~200-block
        # default turns downstream stages into empty-block task storms
        cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
        kwargs["override_num_blocks"] = max(4, min(cpus, 64))
    from .dataops import _clean_schema

    ds = rd.read_parquet(
        files,
        columns=["doc_id", "text"],
        schema=_clean_schema(files[0] if isinstance(files, list) else files,
                             ["doc_id", "text"]),
        **kwargs,
    )
    if shard is not None and num_shards:
        def pick(t: pa.Table) -> pa.Table:
            import numpy as np

            arr = t["doc_id"].to_numpy(zero_copy_only=False)
            return t.filter(pa.array((arr % num_shards) == shard))

        ds = ds.map_batches(pick, batch_format="pyarrow")
    return ds


class InterleaveAdapter:
    """documents(doc_id:int64, text) -> input_hint rows
    (doc_id:string, spans:list<struct>, n_bytes:int64).

    Yields multiple Arrow sub-tables per input batch, cut by cumulative
    html bytes — the skew-defusing block shaping described above.
    """

    def __init__(
        self,
        slice_bytes: int = ADAPTER_SLICE_BYTES,
        replicate: int = 1,
        mode: str = "rich",
    ):
        self.slice_bytes = slice_bytes
        # replicate>1 synthesizes R distinct documents per source row
        # (distinct doc_id seeds -> distinct HTML); used by bench runs to
        # scale work deterministically without external data
        self.replicate = replicate
        # "rich": template-grammar page per FIXTURES.md §1 (exercises the
        # parser); "plain": the raw text as one kind="html" span (the
        # FIXTURES stand-in shape)
        self.mode = mode

    def __call__(self, batch: pa.Table):
        ids = batch["doc_id"].to_pylist()
        texts = batch["text"].to_pylist()
        rows_ids, rows_spans, rows_bytes = [], [], []
        acc = 0
        for did0, text in zip(ids, texts):
            for rep in range(self.replicate):
                did = did0 + rep * 10_000_000
                doc_id = f"doc-{did:012d}"
                if self.mode == "plain":
                    spans = [("html", text or "", "", 0)]
                else:
                    spans = make_interleaved_spans(doc_id, text or "")
                n_bytes = sum(len(s[1]) + len(s[2]) for s in spans)
                rows_ids.append(doc_id)
                rows_spans.append(
                    [
                        {"kind": k, "text": t, "media_ref": m, "offset": o}
                        for k, t, m, o in spans
                    ]
                )
                rows_bytes.append(n_bytes)
                acc += n_bytes
                if acc >= self.slice_bytes:
                    yield self._table(rows_ids, rows_spans, rows_bytes)
                    rows_ids, rows_spans, rows_bytes = [], [], []
                    acc = 0
        if rows_ids:
            yield self._table(rows_ids, rows_spans, rows_bytes)

    @staticmethod
    def _table(ids, spans, nbytes) -> pa.Table:
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.string()),
                "spans": pa.array(spans, pa.list_(SPAN_IN_T)),
                "n_bytes": pa.array(nbytes, pa.int64()),
            }
        )


class ExtractActor:
    """Actor-pool stage: {parse -> tree-build -> boilerplate strip} per row.

    Stateful per SURVEY.md §2.4: the import below compiles the entity
    table, tag sets and heuristic constants once per actor process;
    __call__ touches only per-document state, so the stage is
    deterministic and retry-safe.
    """

    def __init__(self):
        # force the heavy module-level tables into this worker's memory
        from . import entities, tables  # noqa: F401

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        # flatten the span structs ONCE per batch (three C-level string
        # column reads) instead of materializing a Python dict per span
        # (~2x cheaper, measured at 120k docs)
        spans_col = batch["spans"].combine_chunks()
        _flat = spans_col.flatten()
        _trips = list(
            zip(
                _flat.field("kind").to_pylist(),
                _flat.field("text").to_pylist(),
                _flat.field("media_ref").to_pylist(),
            )
        )
        # slice by per-row lengths (robust to sliced/offset list arrays,
        # where .offsets would not start at the flattened position 0)
        spans_in = []
        _pos = 0
        for _ln in pc.list_value_length(spans_col).to_pylist():
            if _ln is None:  # null spans row -> poison-doc path per row
                spans_in.append(None)
                continue
            spans_in.append(_trips[_pos : _pos + _ln])
            _pos += _ln
        nbytes = (
            batch["n_bytes"].to_pylist()
            if "n_bytes" in batch.column_names
            else [0] * len(ids)
        )
        # flat columnar accumulation -> ListArray(StructArray) directly;
        # no per-span Python dicts (measurably cheaper than pa.array on
        # a list-of-dicts at ~10 spans/doc)
        kinds, texts, refs, orders = [], [], [], []
        offsets = [0]
        m_enc, m_quirks, m_err, m_nodes, m_ns = [], [], [], [], []
        ok = []
        for doc_id, row in zip(ids, spans_in):
            try:
                spans, meta = process_document(doc_id, row)
                for k, t, m, o in spans:
                    kinds.append(k)
                    texts.append(t)
                    refs.append(m)
                    orders.append(o)
                m_enc.append(meta["encoding"])
                m_quirks.append(meta["quirks_mode"])
                m_err.append(meta["n_errors"])
                m_nodes.append(meta["n_nodes"])
                m_ns.append(meta["parse_ns"])
                ok.append(True)
            except Exception:  # poison doc: emit an error row, keep the task
                m_enc.append("")
                m_quirks.append(0)
                m_err.append(-1)
                m_nodes.append(0)
                m_ns.append(0)
                ok.append(False)
            offsets.append(len(kinds))
        span_struct = pa.StructArray.from_arrays(
            [
                pa.array(kinds, pa.string()),
                pa.array(texts, pa.string()),
                pa.array(refs, pa.string()),
                pa.array(orders, pa.int32()),
            ],
            names=["kind", "text", "media_ref", "order"],
        )
        spans_col = pa.ListArray.from_arrays(
            pa.array(offsets, pa.int32()), span_struct
        )
        meta_col = pa.StructArray.from_arrays(
            [
                pa.array(m_enc, pa.string()),
                pa.array(m_quirks, pa.int8()),
                pa.array(m_err, pa.int32()),
                pa.array(m_nodes, pa.int32()),
                pa.array(m_ns, pa.int64()),
            ],
            names=["encoding", "quirks_mode", "n_errors", "n_nodes", "parse_ns"],
        )
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.string()),
                "spans": spans_col,
                "meta": meta_col,
                "n_bytes": pa.array(nbytes, pa.int64()),
                "ok": pa.array(ok, pa.bool_()),
            }
        )


def interleaved_dataset(
    sf_dir, shard=None, num_shards=None, replicate: int = 1, mode: str = "rich"
) -> rd.Dataset:
    ds = load_documents(sf_dir, shard, num_shards)
    # NOTE: deliberately an INSTANCE (task stage that FUSES with the
    # downstream extract actor pool).  A class+kwargs actor pool here
    # silences Ray's "constructor arguments in the object store"
    # restart warning but adds a second pool that deadlocks narrow
    # sessions (two pools + read tasks on 4 CPUs) and an extra
    # object-store hop; the warning itself is benign while the driver
    # owns the argument reference (ray-project/ray#53727).
    return ds.map_batches(
        InterleaveAdapter(replicate=replicate, mode=mode),
        batch_format="pyarrow",
        batch_size=256,
    )


def extracted_dataset(
    sf_dir=None,
    ds: rd.Dataset | None = None,
    concurrency=None,
    batch_size: int = 64,
    replicate: int = 1,
) -> rd.Dataset:
    """The flagship pipeline as a lazy Dataset (no materialization)."""
    if ds is None:
        ds = interleaved_dataset(sf_dir, replicate=replicate)
    if concurrency is None:
        # autoscaling pool capped BELOW the CPU count: a pool that
        # reserves every CPU starves the read/adapter stages (measured:
        # a fixed full-width pool deadlocks the streaming executor)
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
        hi = max(2, cpus - 2)
        concurrency = (max(1, min(8, hi // 2)), hi)
    return ds.map_batches(
        ExtractActor,
        batch_format="pyarrow",
        batch_size=batch_size,
        num_cpus=1,
        concurrency=concurrency,
    )


def size_histogram(ds: rd.Dataset, edges=(1 << 8, 1 << 10, 1 << 12, 1 << 14, 1 << 16, 1 << 20)):
    """Doc-size histogram (drives block shaping / skew decisions).

    One cheap vectorized pass over just n_bytes; returns
    {bucket_upper_bound_or_'inf': count}.
    """
    import numpy as np

    nb = len(edges) + 1

    def count(t: pa.Table) -> pa.Table:
        arr = t["n_bytes"].to_numpy(zero_copy_only=False)
        idx = np.searchsorted(np.asarray(edges), arr, side="right")
        hist = np.bincount(idx, minlength=nb)
        return pa.table({f"b{i}": [int(hist[i])] for i in range(nb)})

    partials = ds.select_columns(["n_bytes"]).map_batches(
        count, batch_format="pyarrow"
    )
    totals = partials.sum([f"b{i}" for i in range(nb)])
    labels = [str(e) for e in edges] + ["inf"]
    return {
        lab: int(totals[f"sum(b{i})"]) for i, lab in enumerate(labels)
    }


# ---------------------------------------------------------------------------
# checkpoint-resumable sharded run with lineage manifests


def run_pipeline(
    sf_dir: str,
    out_dir: str,
    num_shards: int = 4,
    concurrency=None,
    batch_size: int = 64,
    resume: bool = True,
):
    """Full run: per-shard extract -> atomic write -> manifest.

    Returns the list of manifest dicts (one per shard).
    """
    os.makedirs(out_dir, exist_ok=True)
    manifest_dir = os.path.join(out_dir, "_manifests")
    os.makedirs(manifest_dir, exist_ok=True)
    manifests = []
    for shard in range(num_shards):
        mpath = os.path.join(manifest_dir, f"shard-{shard}.json")
        if resume and os.path.exists(mpath):
            try:
                with open(mpath) as f:
                    manifests.append(json.load(f))
                continue
            except (json.JSONDecodeError, OSError):
                # torn/corrupt manifest (e.g. crash mid-write): treat the
                # shard as incomplete and recompute it
                os.remove(mpath)
        t0 = time.time()
        ds = interleaved_dataset(sf_dir, shard=shard, num_shards=num_shards)
        out = extracted_dataset(
            ds=ds, concurrency=concurrency, batch_size=batch_size
        )
        shard_dir = os.path.join(out_dir, f"shard={shard}")
        tmp_dir = os.path.join(out_dir, f"_tmp-shard-{shard}")
        if os.path.exists(tmp_dir):
            import shutil

            shutil.rmtree(tmp_dir)
        from .io_lance import write_dataset

        write_dataset(out, tmp_dir)
        if os.path.exists(shard_dir):
            import shutil

            shutil.rmtree(shard_dir)
        os.rename(tmp_dir, shard_dir)
        # lineage metrics from the written files (no recompute)
        stats = _shard_stats(shard_dir)
        manifest = {
            "shard": shard,
            "input": documents_path(sf_dir),
            "completed_at": time.time(),
            "wall_s": round(time.time() - t0, 3),
            **stats,
        }
        tmp_m = mpath + ".tmp"
        with open(tmp_m, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp_m, mpath)
        manifests.append(manifest)
    return manifests


def _shard_stats(shard_dir: str) -> dict:
    import pyarrow.dataset as pds

    dataset = pds.dataset(shard_dir, format="parquet")
    tbl = dataset.to_table(columns=["doc_id", "n_bytes", "meta", "ok"])
    meta = tbl["meta"].combine_chunks()
    n_errors = pc.sum(pc.max_element_wise(meta.field("n_errors"), 0)).as_py()
    ids = tbl["doc_id"]
    return {
        "row_count": tbl.num_rows,
        "byte_count": pc.sum(tbl["n_bytes"]).as_py() or 0,
        "error_count": int(n_errors or 0),
        "failed_docs": int(
            pc.sum(pc.cast(pc.invert(tbl["ok"]), pa.int64())).as_py() or 0
        ),
        "min_doc_id": pc.min(ids).as_py() if tbl.num_rows else None,
        "max_doc_id": pc.max(ids).as_py() if tbl.num_rows else None,
    }


def span_fingerprints(ds: rd.Dataset) -> rd.Dataset:
    """(doc_id, fp) where fp hashes the ordered (kind, text, media_ref,
    order) sequence — the unit of the north-rule invariant."""
    import hashlib

    def fp(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        spans = t["spans"].to_pylist()
        fps = []
        for row in spans:
            h = hashlib.md5()
            for s in row:
                h.update(
                    f"{s['kind']}\x1f{s['text']}\x1f{s['media_ref']}\x1f{s['order']}\x1e".encode()
                )
            fps.append(h.hexdigest())
        return pa.table(
            {"doc_id": pa.array(ids, pa.string()), "fp": pa.array(fps)}
        )

    return ds.map_batches(fp, batch_format="pyarrow")


def conformance_diff(sf_dir, num_partitions: int = 16) -> rd.Dataset:
    """Ray-scale span-equality audit (SURVEY.md §2.3 'Conformance diff').

    Joins the distributed pipeline's span fingerprints against an
    independent oracle pass (plain tasks re-running the single-process
    extractor) hash-partitioned on doc_id, and returns the mismatching
    rows — empty when the invariant holds.  This is the at-scale
    version of the per-row pytest check: it additionally catches
    plumbing corruption (batch slicing, Arrow conversion, shard
    routing) that a single-process comparison cannot.
    """
    engine = span_fingerprints(extracted_dataset(sf_dir))

    def oracle(t: pa.Table) -> pa.Table:
        import hashlib

        ids = t["doc_id"].to_pylist()
        spans_in = t["spans"].to_pylist()
        fps = []
        for doc_id, row in zip(ids, spans_in):
            spans, _ = process_document(
                doc_id, [(s["kind"], s["text"], s["media_ref"]) for s in row]
            )
            h = hashlib.md5()
            for k, txt, m, o in spans:
                h.update(f"{k}\x1f{txt}\x1f{m}\x1f{o}\x1e".encode())
            fps.append(h.hexdigest())
        return pa.table(
            {"doc_id": pa.array(ids, pa.string()), "fp": pa.array(fps)}
        )

    ref = interleaved_dataset(sf_dir).map_batches(
        oracle, batch_format="pyarrow"
    )
    joined = engine.join(
        ref,
        join_type="inner",
        num_partitions=num_partitions,
        on=("doc_id",),
        left_suffix="_engine",
        right_suffix="_oracle",
    )

    def mismatches(t: pa.Table) -> pa.Table:
        return t.filter(
            pc.invert(pc.equal(t["fp_engine"], t["fp_oracle"]))
        )

    return joined.map_batches(mismatches, batch_format="pyarrow")


def reserialized(sf_dir) -> rd.Dataset:
    """Serializer as a pipeline stage (reference S5): parse each html
    span and re-emit spec-serialized HTML — the round-trip surface."""
    from .parser import parse
    from .serializer import serialize

    def rt(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        spans = t["spans"].to_pylist()
        out_ids, html = [], []
        for doc_id, row in zip(ids, spans):
            for s in row:
                if s["kind"] == "html":
                    out_ids.append(doc_id)
                    html.append(serialize(parse(s["text"]).document))
        return pa.table(
            {
                "doc_id": pa.array(out_ids, pa.string()),
                "html": pa.array(html, pa.string()),
            }
        )

    return interleaved_dataset(sf_dir).map_batches(
        rt, batch_format="pyarrow", batch_size=64
    )


def pretty_html(sf_dir, indent_step: int = 1) -> rd.Dataset:
    """Pretty-printing serializer as a pipeline stage: parse each html
    span and re-emit reformatted (indented, whitespace-collapsed) HTML
    — the reference's reformatWhitespace option (Serializer.php:133-208)
    exposed over the corpus.  Same map-only shape as ``reserialized``;
    the pretty path costs more per doc (block-classification walks), so
    it is a separate opt-in stage, never part of the extraction path."""
    from .parser import parse
    from .serializer import serialize

    def rt(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        spans = t["spans"].to_pylist()
        out_ids, html = [], []
        for doc_id, row in zip(ids, spans):
            for s in row:
                if s["kind"] == "html":
                    out_ids.append(doc_id)
                    html.append(
                        serialize(
                            parse(s["text"]).document,
                            reformat_whitespace=True,
                            indent_step=indent_step,
                        )
                    )
        return pa.table(
            {
                "doc_id": pa.array(out_ids, pa.string()),
                "html": pa.array(html, pa.string()),
            }
        )

    return interleaved_dataset(sf_dir).map_batches(
        rt, batch_format="pyarrow", batch_size=64
    )


def dedup_output(ds: rd.Dataset, num_partitions: int | None = None) -> rd.Dataset:
    """Duplicate-doc_id guard for resumed/unioned outputs (SURVEY.md
    §2.3): hash-partition on doc_id so equal ids co-locate, then one
    vectorized drop_duplicates per PARTITION.  Same semantics as a
    per-id groupby-first, but the Python overhead is O(partitions),
    not O(documents) — the measured 0.5 ms/group map_groups trap."""
    from .dataops import _partition_apply

    def first_per_id(g):
        return g.drop_duplicates("doc_id")

    return _partition_apply(ds, ["doc_id"], first_per_id, num_partitions)


def spans_flat(ds: rd.Dataset) -> rd.Dataset:
    """Explode extracted spans to one row per span (doc_id, kind, text,
    media_ref, order) — the SQL-comparable projection of the output."""

    def explode(t: pa.Table) -> pa.Table:
        spans = t["spans"]
        lengths = pc.list_value_length(spans).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(spans).combine_chunks()
        import numpy as np

        doc_ids = t["doc_id"].take(
            pa.array(np.repeat(np.arange(len(t)), lengths), pa.int64())
        )
        return pa.table(
            {
                "doc_id": doc_ids,
                "kind": flat.field("kind"),
                "text": flat.field("text"),
                "media_ref": flat.field("media_ref"),
                "ord": flat.field("order"),
            }
        )

    return ds.map_batches(explode, batch_format="pyarrow")
