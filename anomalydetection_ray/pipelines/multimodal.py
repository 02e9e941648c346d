"""Multimodal column plumbing (driver round-1 extras).

Images/audio/video are opaque ``binary`` columns with typed metadata.  The
decode/resize/frame-sample kernels are STUBBED (no image/audio libs in
this container — clearly marked NotImplementedError), but every piece of
Ray-side plumbing is real and tested: the schema, the actor-pool
``map_batches`` signature (setup once per actor in ``__init__``), small
batch sizes for large payloads, and the output layout.

``deterministic_fake=True`` swaps the stubbed decoder for a seeded fake
(feature vector = bytes digest), so pipelines and tests exercise the full
path end-to-end without media libraries.
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.string()),
        ("kind", pa.string()),  # image | audio | video
        ("payload", pa.binary()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("n_frames", pa.int32()),
    ]
)

FEATURE_DIM = 64


class MediaFeatureExtractor:
    """Actor-pool stage: decode + feature-extract binary media payloads.

    Real deployments load the decoder/model ONCE here (per actor); batches
    stream through __call__.  batch_size must be small (payloads are MBs):
    pass ``batch_size=8..32`` and ``concurrency=(n, m)`` at map_batches.
    """

    def __init__(self, deterministic_fake: bool = False):
        self.fake = deterministic_fake
        if not deterministic_fake:
            # the real decoder would be loaded here, e.g. PIL / torchvision /
            # ffmpeg bindings — absent in this container by design
            self._decoder = None

    def _decode(self, payload: bytes, kind: str) -> np.ndarray:
        if self.fake:
            # seeded digest-features: stable stand-in exercising the full
            # Ray plumbing without media libs
            seed = zlib.crc32(payload)
            rng = np.random.default_rng(seed)
            return rng.standard_normal(FEATURE_DIM)
        raise NotImplementedError(
            "media decode requires an image/audio library not present in "
            "this container; construct MediaFeatureExtractor("
            "deterministic_fake=True) for the plumbing path"
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = [
            self._decode(p, k)
            for p, k in zip(batch.column("payload").to_pylist(), batch.column("kind").to_pylist())
        ]
        arr = np.stack(feats) if feats else np.empty((0, FEATURE_DIM))
        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "kind": batch.column("kind"),
                "features": pa.array(list(arr.astype(np.float32)), type=pa.list_(pa.float32(), FEATURE_DIM)),
            }
        )


def synth_media_from_documents(sf_dir: str, payload_bytes: int = 4096):
    """Deterministic fake media table derived from driver documents (the
    binary payload is the repeated utf-8 text — no external data)."""
    import ray.data

    def to_media(batch: pa.Table) -> pa.Table:
        ids = [str(d) for d in batch.column("doc_id").to_pylist()]
        payloads = []
        kinds = []
        for i, t in enumerate(batch.column("text").to_pylist()):
            b = (t.encode("utf-8") * (payload_bytes // max(1, len(t)) + 1))[:payload_bytes]
            payloads.append(b)
            kinds.append(("image", "audio", "video")[i % 3])
        n = len(ids)
        return pa.table(
            {
                "media_id": pa.array(ids, type=pa.string()),
                "kind": pa.array(kinds, type=pa.string()),
                "payload": pa.array(payloads, type=pa.binary()),
                "width": pa.array([64] * n, type=pa.int32()),
                "height": pa.array([64] * n, type=pa.int32()),
                "n_frames": pa.array([1] * n, type=pa.int32()),
            }
        )

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ds.map_batches(to_media, batch_format="pyarrow", zero_copy_batch=True)


def media_features(sf_dir: str):
    """The full multimodal plumbing path with the deterministic fake
    decoder: small batches + actor pool, as a real media stage would run."""
    media = synth_media_from_documents(sf_dir)
    return media.map_batches(
        MediaFeatureExtractor,
        fn_constructor_kwargs={"deterministic_fake": True},
        batch_format="pyarrow",
        batch_size=32,
        concurrency=(1, 4),
    )
