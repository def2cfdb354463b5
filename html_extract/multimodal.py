"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The real decode kernels (PIL/ffmpeg) are not in this container, so the
decode step is a clearly-marked deterministic fake behind the same
actor signature the real thing would use (NotImplementedError on
``strict=True``).  Everything Ray-side — schema, batch size, actor
pool, output layout — is real and tested.

Schema convention for media payload tables:
    asset_ref : string      (e.g. "mem://asset/doc-xxx/0")
    payload   : binary      (opaque bytes; absent -> synthesized)
    media_type: string      ("image" | "audio" | "video")
"""

import hashlib

import numpy as np
import pyarrow as pa
import ray.data as rd

FEATURE_DIM = 32


def synthesize_payload(asset_ref: str, n_bytes: int = 256) -> bytes:
    """Deterministic pseudo-payload for an asset ref (test stand-in)."""
    out = bytearray()
    seed = asset_ref.encode()
    counter = 0
    while len(out) < n_bytes:
        out += hashlib.blake2b(seed + counter.to_bytes(4, "big"), digest_size=32).digest()
        counter += 1
    return bytes(out[:n_bytes])


class MediaDecodeActor:
    """Decode/feature-extract stage (actor pool: model state loads once).

    strict=True raises NotImplementedError where a real image/audio
    decoder would run; strict=False produces deterministic fake
    features (blake2-seeded) with the real output schema.
    """

    def __init__(self, strict: bool = False, feature_dim: int = FEATURE_DIM):
        self.strict = strict
        self.feature_dim = feature_dim

    def _features(self, payload: bytes) -> np.ndarray:
        if self.strict:
            raise NotImplementedError(
                "real media decode requires PIL/ffmpeg (unavailable here); "
                "run with strict=False for the deterministic fake"
            )
        need = self.feature_dim * 4
        raw = b""
        counter = 0
        while len(raw) < need:
            raw += hashlib.blake2b(
                payload + counter.to_bytes(4, "big"), digest_size=64
            ).digest()
            counter += 1
        arr = np.frombuffer(raw[:need], dtype=np.uint32).astype(np.float32)
        return arr / np.float32(2**32)

    def __call__(self, t: pa.Table) -> pa.Table:
        refs = t["asset_ref"].to_pylist()
        if "payload" in t.column_names:
            payloads = t["payload"].to_pylist()
        else:
            payloads = [synthesize_payload(r) for r in refs]
        feats = [self._features(p) for p in payloads]
        return pa.table(
            {
                "asset_ref": pa.array(refs, pa.string()),
                "n_bytes": pa.array([len(p) for p in payloads], pa.int64()),
                "features": pa.array(
                    [f.tolist() for f in feats], pa.list_(pa.float32())
                ),
            }
        )


def media_features(sf_dir) -> rd.Dataset:
    """Extract media refs from the flagship pipeline output and run the
    decode/feature actor pool over them (small batches: binary rows)."""
    from . import pipeline as P

    flat = P.spans_flat(P.extracted_dataset(sf_dir))

    def media_only(t: pa.Table) -> pa.Table:
        kept = t.filter(pa.compute.equal(t["kind"], "media"))
        return pa.table({"asset_ref": kept["media_ref"]})

    refs = flat.map_batches(media_only, batch_format="pyarrow")
    return refs.map_batches(
        MediaDecodeActor,
        batch_format="pyarrow",
        batch_size=128,  # binary payloads: keep batches small
        concurrency=(1, 8),
        num_cpus=1,
    )


def media_type_of(asset_ref: str) -> str:
    """Deterministic stand-in for stored media-type metadata (the
    driver corpus carries refs only): blake2-keyed assignment."""
    h = hashlib.blake2b(asset_ref.encode(), digest_size=2).digest()
    return ("image", "audio", "video")[h[0] % 3]


class MediaResizeActor:
    """Image-resize stage (actor pool).  The pixel kernel is a
    clearly-marked deterministic fake (strided byte subsample of the
    payload standing in for PIL's resize; strict=True raises where the
    real decoder would run); the Ray plumbing — binary-sized batches,
    per-actor setup, fixed output schema with real dimensions — is the
    production shape."""

    def __init__(self, target: int = 64, strict: bool = False):
        self.target = target
        self.strict = strict

    def _resize(self, payload: bytes) -> tuple[bytes, int, int]:
        if self.strict:
            raise NotImplementedError(
                "real image resize requires PIL (unavailable here); "
                "run with strict=False for the deterministic fake"
            )
        side = max(1, int(len(payload) ** 0.5))
        t = self.target
        if side <= t:
            return payload, side, side
        idx = np.linspace(0, len(payload) - 1, t * t).astype(np.int64)
        arr = np.frombuffer(payload, dtype=np.uint8)[idx]
        return arr.tobytes(), t, t

    def __call__(self, t: pa.Table) -> pa.Table:
        refs = t["asset_ref"].to_pylist()
        payloads = (
            t["payload"].to_pylist()
            if "payload" in t.column_names
            else [synthesize_payload(r) for r in refs]
        )
        out_p, w, h = [], [], []
        for p in payloads:
            rp, rw, rh = self._resize(p)
            out_p.append(rp)
            w.append(rw)
            h.append(rh)
        return pa.table(
            {
                "asset_ref": pa.array(refs, pa.string()),
                "width": pa.array(w, pa.int32()),
                "height": pa.array(h, pa.int32()),
                "n_bytes_in": pa.array(
                    [len(p) for p in payloads], pa.int64()
                ),
                "payload": pa.array(out_p, pa.binary()),
            }
        )


class FrameSampleActor:
    """Video frame-sampling stage: one input row expands to
    ``n_frames`` frame rows (asset_ref, frame_idx, t_offset_ms,
    payload) — the row-expanding actor-pool shape a real ffmpeg
    sampler uses.  Frame extraction itself is a deterministic fake
    (equal payload slices); strict=True raises at the kernel."""

    def __init__(self, n_frames: int = 4, duration_ms: int = 4000,
                 strict: bool = False):
        self.n_frames = n_frames
        self.duration_ms = duration_ms
        self.strict = strict

    def _frames(self, payload: bytes):
        if self.strict:
            raise NotImplementedError(
                "real frame sampling requires ffmpeg (unavailable here); "
                "run with strict=False for the deterministic fake"
            )
        n = self.n_frames
        step = max(1, len(payload) // n)
        return [payload[i * step : (i + 1) * step] for i in range(n)]

    def __call__(self, t: pa.Table) -> pa.Table:
        refs = t["asset_ref"].to_pylist()
        payloads = (
            t["payload"].to_pylist()
            if "payload" in t.column_names
            else [synthesize_payload(r, n_bytes=1024) for r in refs]
        )
        o_ref, o_idx, o_ts, o_p = [], [], [], []
        for r, p in zip(refs, payloads):
            for i, fp in enumerate(self._frames(p)):
                o_ref.append(r)
                o_idx.append(i)
                o_ts.append(i * self.duration_ms // max(1, self.n_frames))
                o_p.append(fp)
        return pa.table(
            {
                "asset_ref": pa.array(o_ref, pa.string()),
                "frame_idx": pa.array(o_idx, pa.int32()),
                "t_offset_ms": pa.array(o_ts, pa.int32()),
                "payload": pa.array(o_p, pa.binary()),
            }
        )


def media_frames(sf_dir, n_frames: int = 4) -> rd.Dataset:
    """Video refs from the flagship output -> frame sampling -> per-
    frame features.  Three chained actor-pool stages over binary-sized
    batches (the full multimodal shape: type routing, row expansion,
    then batched feature extraction)."""
    from . import pipeline as P

    flat = P.spans_flat(P.extracted_dataset(sf_dir))

    def video_refs(t: pa.Table) -> pa.Table:
        kept = t.filter(pa.compute.equal(t["kind"], "media"))
        refs = [
            r
            for r in kept["media_ref"].to_pylist()
            if media_type_of(r) == "video"
        ]
        return pa.table({"asset_ref": pa.array(refs, pa.string())})

    refs = flat.map_batches(video_refs, batch_format="pyarrow")
    frames = refs.map_batches(
        FrameSampleActor,
        fn_constructor_kwargs={"n_frames": n_frames},
        batch_format="pyarrow",
        batch_size=64,
        concurrency=(1, 4),
        num_cpus=1,
    )
    return frames.map_batches(
        MediaDecodeActor,
        batch_format="pyarrow",
        batch_size=128,
        concurrency=(1, 4),
        num_cpus=1,
    )
