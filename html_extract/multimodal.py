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
