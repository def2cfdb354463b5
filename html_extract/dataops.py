"""Training-data pipeline operations over the corpus tables.

These are the large-scale data-prep operators a 100 TB extraction
pipeline needs alongside the parser: dedup (exact / MinHash-LSH /
SimHash / n-gram Jaccard / embedding-cosine), similarity search,
text analysis (language-ID, quality scoring, token counting,
fingerprinting) and windowed event aggregation.

Design rules applied throughout (see ray_guide / SURVEY.md §4):
- column pruning at the read,
- vectorized per-batch kernels (pandas/numpy/pyarrow),
- partial aggregation inside map_batches BEFORE any groupby shuffle,
- small sides broadcast once with ray.put, never shuffled,
- deterministic hashes only (blake2/md5/crc32 — never PYTHONHASHSEED-
  dependent builtins), so results are stable across machines.
"""

import hashlib
import os
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd


def _path(sf_dir, name):
    return os.path.join(sf_dir, f"{name}.parquet")


def _read(sf_dir, name, columns) -> rd.Dataset:
    """Column-pruned read with a block count scaled to the input size.

    Ray's default read parallelism (~200 blocks) is tuned for large
    inputs; on dimension-scale tables it turns every downstream shuffle
    into thousands of empty-block tasks (measured 5x slowdown on a
    5k-row groupby).  Small file -> one block per ~16 MiB, floored at
    the CPU count; big inputs keep Ray's default.
    """
    path = _path(sf_dir, name)
    size = os.path.getsize(path)
    if size > (1 << 30):
        return rd.read_parquet(path, columns=columns)
    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    nblocks = max(4, min(cpus, 64), size // (16 << 20))
    return rd.read_parquet(path, columns=columns, override_num_blocks=int(nblocks))


# ---------------------------------------------------------------------------
# keyed aggregation: combiner tree instead of ds.groupby
#
# Ray Data's sort-based groupby().aggregate() pays ~per-group Python
# overhead in the reduce (measured: 153k groups -> 78 s for a trivial
# count).  For associative/commutative aggregates the combiner pattern
# is strictly better: vectorized pandas groupby per batch (massive
# shrink), then one vectorized final combine over the partials.  The
# final combine is a single task — correct whenever the DISTINCT-KEY
# set fits one worker (true for every key here: sources, langs, hours,
# nations, content hashes per shard).  At 10^12-doc scale the partials
# would be hash-partitioned by key first and the same combine run per
# partition.


def _tree_agg(ds: rd.Dataset, partial_fn, combine_fn=None) -> rd.Dataset:
    partials = ds.map_batches(partial_fn, batch_format="pandas")
    return partials.repartition(1).map_batches(
        combine_fn or partial_fn, batch_format="pandas", batch_size=None
    )


def doc_stats_by_source(sf_dir) -> rd.Dataset:
    """Per-source document count and total characters."""
    ds = _read(sf_dir, "documents", ["source", "n_chars"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("source", as_index=False).agg(
            n_docs=("n_chars", "size"), sum_chars=("n_chars", "sum")
        )
        return g

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("source", as_index=False).agg(
            n_docs=("n_docs", "sum"), sum_chars=("sum_chars", "sum")
        )

    return _tree_agg(ds, partial, combine)


def lang_distribution(sf_dir) -> rd.Dataset:
    ds = _read(sf_dir, "documents", ["lang"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("lang", as_index=False).agg(n_docs=("lang", "size"))

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("lang", as_index=False).agg(n_docs=("n_docs", "sum"))

    return _tree_agg(ds, partial, combine)


def doc_size_histogram(sf_dir) -> pd.DataFrame:
    """n_chars histogram buckets — the same shape the repartition stage
    consumes (SURVEY.md §2.3)."""
    edges = [64, 128, 256, 512]
    ds = _read(sf_dir, "documents", ["n_chars"])

    def partial(t: pa.Table) -> pa.Table:
        arr = t["n_chars"].to_numpy(zero_copy_only=False)
        idx = np.searchsorted(edges, arr, side="left")  # bucket i: <= edges[i]
        hist = np.bincount(idx, minlength=len(edges) + 1)
        return pa.table({f"b{i}": [int(hist[i])] for i in range(len(edges) + 1)})

    totals = ds.map_batches(partial, batch_format="pyarrow").sum(
        [f"b{i}" for i in range(len(edges) + 1)]
    )
    labels = [str(e) for e in edges] + ["inf"]
    return pd.DataFrame(
        {
            "bucket": labels,
            "n_docs": [int(totals[f"sum(b{i})"]) for i in range(len(edges) + 1)],
        }
    )


# ---------------------------------------------------------------------------
# text analysis


_TOKEN_RE = re.compile(r"\S+")
_PUNCT_RE = re.compile(r"[.,!?;:]")

_STOPWORDS = {
    "en": frozenset("the a and of to in is it you that for on with as at be this".split()),
    "de": frozenset("der die das und ist ich nicht mit ein eine zu den von für".split()),
    "es": frozenset("el la los las de que y en un una es no por con para".split()),
    "fr": frozenset("le la les de des et un une est en que pour dans du ne".split()),
}


def token_counts(sf_dir) -> rd.Dataset:
    """Whitespace token count per document (vectorized str kernel)."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def f(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "n_tokens": df["text"].str.count(_TOKEN_RE).astype("int64"),
            }
        )

    return ds.map_batches(f, batch_format="pandas")


def quality_scores(sf_dir) -> rd.Dataset:
    """Integer quality features: length, word count, non-space chars,
    punctuation count (the SQL-checkable core of quality scoring)."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def f(df: pd.DataFrame) -> pd.DataFrame:
        text = df["text"]
        n_chars = text.str.len().astype("int64")
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "n_chars": n_chars,
                "n_words": text.str.count(_TOKEN_RE).astype("int64"),
                "chars_no_space": (
                    n_chars - text.str.count(" ").astype("int64")
                ),
                "n_punct": text.str.count(_PUNCT_RE).astype("int64"),
            }
        )

    return ds.map_batches(f, batch_format="pandas")


class LangIdActor:
    """n-gram/stopword heuristic language ID (stateful: tables compiled
    once per actor)."""

    def __init__(self):
        self.stop = {k: v for k, v in _STOPWORDS.items()}
        self.word_re = re.compile(r"[a-zà-ÿäöüß]+")
        self.cjk_re = re.compile(r"[一-鿿]")

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for text in df["text"]:
            if self.cjk_re.search(text):
                out.append("zh")
                continue
            words = self.word_re.findall(text.lower())
            if not words:
                out.append("und")
                continue
            best, best_hits = "und", 0
            for lang, stops in self.stop.items():
                hits = sum(1 for w in words if w in stops)
                if hits > best_hits:
                    best, best_hits = lang, hits
            out.append(best)
        return pd.DataFrame({"doc_id": df["doc_id"], "lang_pred": out})


def langid(sf_dir) -> rd.Dataset:
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(
        LangIdActor, batch_format="pandas", batch_size=1024, concurrency=(1, 8)
    )


def stopword_counts(sf_dir) -> rd.Dataset:
    """English stopword occurrences per document (quality-signal core)."""
    stops = _STOPWORDS["en"]
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def f(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "n_stop": [
                    sum(1 for w in t.split() if w in stops) for t in df["text"]
                ],
            }
        ).astype({"n_stop": "int64"})

    return ds.map_batches(f, batch_format="pandas")


def top_sources_by_chars(sf_dir, k: int = 5) -> pd.DataFrame:
    """Top-k sources by total characters (sort + limit over the
    aggregated stats; ties broken by source name)."""
    stats = doc_stats_by_source(sf_dir).to_pandas()
    stats = stats.sort_values(
        ["sum_chars", "source"], ascending=[False, True], ignore_index=True
    )
    return stats.head(k)[["source", "sum_chars"]]


def top_users_by_events(sf_dir, k: int = 10) -> pd.DataFrame:
    """Top-k users by event count (partial counts -> combine -> top-k;
    deterministic tie-break on user_id)."""
    ds = _read(sf_dir, "events", ["user_id"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        col = "n" if "n" in df.columns else "user_id"
        if "n" in df.columns:
            return df.groupby("user_id", as_index=False).agg(n=("n", "sum"))
        return df.groupby("user_id", as_index=False).agg(n=("user_id", "size"))

    agg = _tree_agg(ds, partial).to_pandas()
    agg = agg.sort_values(["n", "user_id"], ascending=[False, True], ignore_index=True)
    return agg.head(k).astype({"n": "int64"})


def sampled_docs(sf_dir, fraction=0.1, seed=7) -> pd.DataFrame:
    """Seeded random sample of documents (corpus-curation subsampling).

    `ds.random_sample` is per-row Bernoulli with a seeded generator, so
    the row COUNT varies with block layout; for a deterministic result
    the sample is keyed on a hash of doc_id instead — stable across any
    partitioning (the property a resumable sampling stage needs)."""
    ds = _read(sf_dir, "documents", ["doc_id"])
    cut = int(fraction * 0xFFFFFFFF)

    def pick(df: pd.DataFrame) -> pd.DataFrame:
        import zlib

        keep = [
            zlib.crc32(f"{seed}:{d}".encode()) <= cut for d in df["doc_id"]
        ]
        return df[pd.Series(keep, index=df.index)]

    out = ds.map_batches(pick, batch_format="pandas").to_pandas()
    return out.sort_values("doc_id", ignore_index=True)


def lineitem_pricing_summary(sf_dir) -> rd.Dataset:
    """TPC-H Q1-shaped aggregate over the largest driver table
    (integer-safe: quantities are integral; money stays out of the
    hash-compared columns).  Pre-aggregated per batch, tiny combine."""
    ds = _read(
        sf_dir,
        "lineitem",
        ["l_returnflag", "l_linestatus", "l_quantity"],
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if "n_items" in df.columns:
            return df.groupby(
                ["l_returnflag", "l_linestatus"], as_index=False
            ).agg(n_items=("n_items", "sum"), sum_qty=("sum_qty", "sum"))
        g = df.groupby(["l_returnflag", "l_linestatus"], as_index=False).agg(
            n_items=("l_quantity", "size"), sum_qty=("l_quantity", "sum")
        )
        g["sum_qty"] = g["sum_qty"].astype("int64")
        return g

    return _tree_agg(ds, partial)


def word_frequencies(sf_dir, k: int = 50) -> pd.DataFrame:
    """Global top-k word counts (the canonical distributed wordcount:
    vectorized count per batch -> tiny combine -> top-k; ties broken by
    word for determinism)."""
    ds = _read(sf_dir, "documents", ["text"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if "word" in df.columns:
            return df.groupby("word", as_index=False).agg(n=("n", "sum"))
        words = df["text"].str.split().explode()
        g = words.value_counts().reset_index()
        g.columns = ["word", "n"]
        return g

    agg = _tree_agg(ds, partial).to_pandas()
    agg = agg.sort_values(["n", "word"], ascending=[False, True], ignore_index=True)
    return agg.head(k).astype({"n": "int64"})


def normalized_text(sf_dir) -> rd.Dataset:
    """Unicode NFC + whitespace-collapse + trim per document — the
    canonical text-cleaning stage before tokenization/dedup."""
    import unicodedata

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    ws = re.compile(r"\s+")

    def f(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "norm": [
                    ws.sub(" ", unicodedata.normalize("NFC", t)).strip()
                    for t in df["text"]
                ],
            }
        )

    return ds.map_batches(f, batch_format="pandas")


def doc_fingerprints(sf_dir) -> rd.Dataset:
    """Content fingerprint per doc (md5 — matches SQL md5())."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def f(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "fp": [
                    hashlib.md5(t.encode("utf-8")).hexdigest() for t in df["text"]
                ],
            }
        )

    return ds.map_batches(f, batch_format="pandas")


# ---------------------------------------------------------------------------
# dedup


def exact_dedup(sf_dir) -> rd.Dataset:
    """Exact dedup: hash-partition on content hash, keep min doc_id.

    Scale shape: the shuffle key is the 16-byte digest, never the text;
    the groupby moves one short row per document."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def h_min(df: pd.DataFrame) -> pd.DataFrame:
        if "h" not in df.columns:
            df = pd.DataFrame(
                {
                    "doc_id": df["doc_id"],
                    "h": [
                        hashlib.md5(t.encode("utf-8")).hexdigest()
                        for t in df["text"]
                    ],
                }
            )
        return df.groupby("h", as_index=False).agg(doc_id=("doc_id", "min"))

    return _tree_agg(ds, h_min).select_columns(["doc_id"])


_MINHASH_PERMS = 128
_MINHASH_BANDS = 32  # 32 bands x 4 rows
_rng = np.random.RandomState(0xC0FFEE)
# odd multipliers + offsets mod 2^64 (multiply-shift family; wrapping
# uint64 math keeps the whole signature computation vectorized)
_MH_A = (
    _rng.randint(1, 1 << 62, size=_MINHASH_PERMS).astype(np.uint64) * 2 + 1
)
_MH_B = _rng.randint(0, 1 << 62, size=_MINHASH_PERMS).astype(np.uint64)


def _shingles(text, k=3):
    toks = text.split()
    if len(toks) < k:
        return {" ".join(toks)} if toks else set()
    return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}


def _shingle_hashes(text, k=3):
    return np.fromiter(
        (
            int.from_bytes(hashlib.blake2b(s.encode(), digest_size=8).digest(), "big")
            for s in _shingles(text, k)
        ),
        dtype=np.uint64,
        count=-1,
    )


def _minhash_sig(text, k=3):
    h = _shingle_hashes(text, k)
    if h.size == 0:
        return np.zeros(_MINHASH_PERMS, dtype=np.uint64)
    with np.errstate(over="ignore"):
        vals = h[:, None] * _MH_A[None, :] + _MH_B[None, :]  # wraps mod 2^64
    return np.min(vals, axis=0)


class MinHashActor:
    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        rows = {"doc_id": [], "band": [], "band_hash": []}
        for doc_id, text in zip(df["doc_id"], df["text"]):
            sig = _minhash_sig(text)
            per_band = sig.reshape(_MINHASH_BANDS, -1)
            for b in range(_MINHASH_BANDS):
                bh = hashlib.blake2b(
                    per_band[b].tobytes(), digest_size=8
                ).hexdigest()
                rows["doc_id"].append(doc_id)
                rows["band"].append(b)
                rows["band_hash"].append(bh)
        return pd.DataFrame(rows)


def minhash_candidates(sf_dir) -> pd.DataFrame:
    """MinHash-LSH candidate pairs: shingle -> 128-perm signature ->
    32 bands -> bucket by (band, band_hash) -> pairs within a bucket.

    Pair generation avoids per-group Python calls (a map_groups over
    ~n_docs*32 one-row buckets costs more than the hashing itself):
    (1) vectorized count per bucket, (2) keep only buckets with >= 2
    docs — by LSH construction a tiny, similarity-bearing subset —
    (3) self-merge those rows.  At 100 TB step 3 becomes a hash join
    on band_hash with hot buckets salted; steps 1-2 are unchanged."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    bands = ds.map_batches(
        MinHashActor, batch_format="pandas", batch_size=512, concurrency=(1, 8)
    )
    # two consumers below (counts + bucket filter): pin the band table —
    # it is ~32 short rows/doc, far smaller than the corpus.  At real
    # scale this is a persisted intermediate (write_parquet), same idea.
    bands = bands.materialize()

    def partial_counts(df: pd.DataFrame) -> pd.DataFrame:
        if "n" in df.columns:
            return (
                df.groupby(["band", "band_hash"], as_index=False)
                .agg(n=("n", "sum"))
            )
        return (
            df.groupby(["band", "band_hash"], sort=False)
            .size()
            .reset_index(name="n")
        )

    counts = _tree_agg(bands, partial_counts).to_pandas()
    dup_keys = counts[counts["n"] >= 2]
    if len(dup_keys) == 0:
        return pd.DataFrame({"a": [], "b": [], "n_bands": []})
    keyset = set(zip(dup_keys["band"], dup_keys["band_hash"]))
    key_ref = ray.put(keyset)

    def in_dup_bucket(df: pd.DataFrame) -> pd.DataFrame:
        ks = ray.get(key_ref)
        mask = [
            (b, h) in ks for b, h in zip(df["band"], df["band_hash"])
        ]
        return df[pd.Series(mask, index=df.index)]

    hits = bands.map_batches(in_dup_bucket, batch_format="pandas").to_pandas()
    merged = hits.merge(hits, on=["band", "band_hash"])
    merged = merged[merged["doc_id_x"] < merged["doc_id_y"]]
    pairs = (
        merged.groupby(["doc_id_x", "doc_id_y"])
        .size()
        .reset_index(name="n_bands")
        .rename(columns={"doc_id_x": "a", "doc_id_y": "b"})
    )
    return pairs


def minhash_dedup(sf_dir, jaccard_threshold_pct=80) -> pd.DataFrame:
    """Near-dup clusters: LSH candidates -> exact n-gram Jaccard verify
    -> connected components -> (doc_id, cluster_id).

    The verify step broadcasts the shingle sets once (ray.put) because
    the candidate set at test scale is tiny; at 100 TB the pairs would
    instead be joined back to the text by doc_id (two hash joins) and
    components run via iterative min-label propagation."""
    docs = pd.read_parquet(
        _path(sf_dir, "documents"), columns=["doc_id", "text"]
    )
    cand = minhash_candidates(sf_dir)
    shingle_ref = ray.put(
        {d: _shingles(t) for d, t in zip(docs["doc_id"], docs["text"])}
    )

    @ray.remote
    def verify(pairs_chunk):
        sh = ray.get(shingle_ref)
        keep = []
        for a, b in pairs_chunk:
            sa, sb = sh[a], sh[b]
            inter = len(sa & sb)
            union = len(sa | sb) or 1
            if 100 * inter >= jaccard_threshold_pct * union:
                keep.append((a, b))
        return keep

    pair_list = list(zip(cand["a"], cand["b"])) if len(cand) else []
    chunks = [pair_list[i : i + 2048] for i in range(0, len(pair_list), 2048)]
    verified = [p for c in ray.get([verify.remote(c) for c in chunks]) for p in c]
    # union-find on the driver (pair count << doc count)
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in verified:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    cluster = [find(d) if d in parent else d for d in docs["doc_id"]]
    return pd.DataFrame({"doc_id": docs["doc_id"], "cluster_id": cluster})


def simhash_fingerprints(sf_dir) -> rd.Dataset:
    """64-bit SimHash per document (deterministic blake2 token hashes)."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def f(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for text in df["text"]:
            acc = np.zeros(64, dtype=np.int64)
            for tok in set(text.split()):
                h = int.from_bytes(
                    hashlib.blake2b(tok.encode(), digest_size=8).digest(), "big"
                )
                bits = np.fromiter(
                    ((h >> i) & 1 for i in range(64)), dtype=np.int64, count=64
                )
                acc += 2 * bits - 1
            val = 0
            for i in range(64):
                if acc[i] > 0:
                    val |= 1 << i
            out.append(f"{val:016x}")
        return pd.DataFrame({"doc_id": df["doc_id"], "simhash": out})

    return ds.map_batches(f, batch_format="pandas", batch_size=1024)


def _load_normalized_embeddings(sf_dir):
    emb = pd.read_parquet(_path(sf_dir, "embeddings")).sort_values(
        "vec_id", ignore_index=True
    )
    M = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    norms = np.linalg.norm(M, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return emb["vec_id"].to_numpy(), M / norms


def embedding_near_dups(sf_dir, threshold_pct=95) -> pd.DataFrame:
    """Embedding-cosine near-dup pairs: the full normalized matrix is
    broadcast once (ray.put) and each batch computes its block of the
    similarity matrix — a row-blocked matmul, not a shuffle.  At 10^12
    scale the matrix side is replaced by an LSH/IVF bucket index
    (``ann_topk_lsh`` shows the bucketing); the batch kernel is the same.
    """
    ids_all, Mn = _load_normalized_embeddings(sf_dir)
    ref = ray.put((ids_all, Mn))

    class BlockSim:
        def __init__(self):
            self.ids_all, self.Mn = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            vec_ids = t["vec_id"].to_numpy(zero_copy_only=False)
            rows = np.searchsorted(self.ids_all, np.sort(vec_ids))
            block = self.Mn[rows]
            sims = block @ self.Mn.T
            a_out, b_out = [], []
            srt = np.sort(vec_ids)
            for i, vid in enumerate(srt):
                hits = np.where(sims[i] * 100 >= threshold_pct)[0]
                for j in hits:
                    other = int(self.ids_all[j])
                    if other > int(vid):  # upper triangle only
                        a_out.append(int(vid))
                        b_out.append(other)
            return pa.table(
                {
                    "a": pa.array(a_out, pa.int64()),
                    "b": pa.array(b_out, pa.int64()),
                }
            )

    ds = _read(sf_dir, "embeddings", ["vec_id"])
    out = ds.map_batches(
        BlockSim, batch_format="pyarrow", batch_size=1024, concurrency=(1, 8)
    ).to_pandas()
    if "a" not in out.columns:  # no pairs anywhere -> schema-less empty df
        return pd.DataFrame({"a": pd.Series(dtype="int64"), "b": pd.Series(dtype="int64")})
    return out.sort_values(["a", "b"], ignore_index=True)


def ann_topk_lsh(sf_dir, n_queries=5, k=10, n_planes=6) -> pd.DataFrame:
    """LSH-bucketed ANN (the 100 TB scale path for ``ann_topk``):
    random-hyperplane signs bucket the corpus; each query searches only
    its own bucket.  Deterministic planes (fixed seed).  Approximate by
    construction — quality is judged by recall vs the brute-force
    baseline (see tests), cost by candidate count."""
    ids_all, Mn = _load_normalized_embeddings(sf_dir)
    dim = Mn.shape[1]
    planes = np.random.RandomState(0xA11CE).normal(size=(dim, n_planes))
    codes = (Mn @ planes > 0) @ (1 << np.arange(n_planes))
    rows = []
    for qi in range(min(n_queries, len(ids_all))):
        bucket = np.where(codes == codes[qi])[0]
        sims = Mn[bucket] @ Mn[qi]
        order = np.lexsort((ids_all[bucket], -sims))[:k]
        for rank, j in enumerate(order, 1):
            rows.append((int(ids_all[qi]), int(ids_all[bucket[j]]), rank))
    return pd.DataFrame(rows, columns=["query_id", "neighbor_id", "rank"])


# ---------------------------------------------------------------------------
# similarity search (ANN)


def ann_topk(sf_dir, n_queries=5, k=10) -> pd.DataFrame:
    """Brute-force cosine top-k: broadcast the query matrix once, partial
    top-k per batch, tiny driver-side merge.  IVF/LSH is the 100 TB
    path; the batch kernel is the same."""
    qdf = pd.read_parquet(_path(sf_dir, "embeddings")).sort_values("vec_id")
    qdf = qdf[qdf["vec_id"] < n_queries]
    Q = np.stack(qdf["embedding"].to_numpy()).astype(np.float64)
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    q_ids = qdf["vec_id"].to_numpy()
    q_ref = ray.put((q_ids, Qn))

    class Scorer:
        def __init__(self):
            self.q_ids, self.Qn = ray.get(q_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            vec_ids = t["vec_id"].to_numpy(zero_copy_only=False)
            M = np.stack(t["embedding"].to_pandas().to_numpy()).astype(np.float64)
            Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
            sims = Mn @ self.Qn.T  # (batch, n_queries)
            rows = {"query_id": [], "neighbor_id": [], "score": []}
            top = min(k, len(vec_ids))
            for qi, qid in enumerate(self.q_ids):
                col = sims[:, qi]
                part = np.argpartition(-col, top - 1)[:top]
                for r in part:
                    rows["query_id"].append(int(qid))
                    rows["neighbor_id"].append(int(vec_ids[r]))
                    rows["score"].append(float(col[r]))
            return pa.table(rows)

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    partial = ds.map_batches(
        Scorer, batch_format="pyarrow", batch_size=4096, concurrency=(1, 8)
    ).to_pandas()
    partial = partial.sort_values(
        ["query_id", "score", "neighbor_id"], ascending=[True, False, True]
    )
    topk = partial.groupby("query_id", sort=True).head(k).reset_index(drop=True)
    topk["rank"] = topk.groupby("query_id").cumcount() + 1
    return topk[["query_id", "neighbor_id", "rank"]].astype("int64")


# ---------------------------------------------------------------------------
# windowed event aggregation


def events_hourly(sf_dir) -> rd.Dataset:
    """Tumbling 1h window per event_type: partial count per batch, then
    a tiny groupby over (event_type, hour)."""
    ds = _read(sf_dir, "events", ["event_type", "ts"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if "n_events" in df.columns:
            return df.groupby(["event_type", "hour"], as_index=False).agg(
                n_events=("n_events", "sum")
            )
        hour = df["ts"].dt.floor("h").astype("datetime64[us]").astype(str)
        return (
            pd.DataFrame({"event_type": df["event_type"], "hour": hour})
            .groupby(["event_type", "hour"], sort=False)
            .size()
            .reset_index(name="n_events")
        )

    return _tree_agg(ds, partial)


def user_sessions(sf_dir, gap_minutes=30) -> rd.Dataset:
    """Session windows per user: sort within user groups (the ordering
    assumption: one group = one user's full history)."""
    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id"])

    def sessions(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("ts")
        gap = g["ts"].diff() > pd.Timedelta(minutes=gap_minutes)
        sid = gap.cumsum()
        agg = g.groupby(sid).agg(
            user_id=("user_id", "first"),
            start_ts=("ts", "min"),
            end_ts=("ts", "max"),
            n_events=("event_id", "count"),
        )
        return agg.reset_index(drop=True)

    return ds.groupby("user_id").map_groups(sessions, batch_format="pandas")


# ---------------------------------------------------------------------------
# broadcast join


def orders_by_nation(sf_dir) -> rd.Dataset:
    """Order counts per nation: broadcast customer->nation lookup
    (ray.put once), no shuffle join; then a 25-row groupby."""
    cust = pd.read_parquet(
        _path(sf_dir, "customer"), columns=["c_custkey", "c_nationkey"]
    )
    nation = pd.read_parquet(
        _path(sf_dir, "nation"), columns=["n_nationkey", "n_name"]
    )
    nk = cust.set_index("c_custkey")["c_nationkey"]
    lookup_ref = ray.put(
        (
            nk.index.to_numpy(),
            nk.to_numpy(),
            nation.set_index("n_nationkey")["n_name"].to_dict(),
        )
    )

    class JoinCount:
        def __init__(self):
            keys, vals, names = ray.get(lookup_ref)
            order = np.argsort(keys)
            self.keys = keys[order]
            self.vals = vals[order]
            self.names = names

        def __call__(self, t: pa.Table) -> pa.Table:
            ck = t["o_custkey"].to_numpy(zero_copy_only=False)
            idx = np.searchsorted(self.keys, ck)
            nkeys = self.vals[idx]
            uniq, counts = np.unique(nkeys, return_counts=True)
            return pa.table(
                {
                    "n_name": [self.names[int(u)] for u in uniq],
                    "n": counts.astype("int64"),
                }
            )

    ds = _read(sf_dir, "orders", ["o_custkey"])
    partials = ds.map_batches(
        JoinCount, batch_format="pyarrow", concurrency=(1, 8)
    )

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("n_name", as_index=False).agg(n_orders=("n", "sum"))

    return partials.repartition(1).map_batches(
        combine, batch_format="pandas", batch_size=None
    )
