"""Multimodal column plumbing (driver round-1 extras).

Images/audio/video are opaque ``binary`` columns with typed metadata.
Decoders: audio is REAL (stdlib ``wave``); image and video are real
behind optional dependencies (PIL / PyAV ffmpeg bindings), loaded once
per actor and raising a clear NotImplementedError when absent — never a
silent fake.  Every piece of Ray-side plumbing is real and tested: the
schema, the actor-pool ``map_batches`` signature (setup once per actor
in ``__init__``), small batch sizes for large payloads, and the output
layout.

``deterministic_fake=True`` swaps the stubbed decoder for a seeded fake
(feature vector = bytes digest), so pipelines and tests exercise the full
path end-to-end without media libraries.
"""

from __future__ import annotations

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
        self._pil = None
        self._av = None
        if not deterministic_fake:
            # optional-dependency decoders, loaded ONCE per actor; absent
            # in this container -> the corresponding path raises a clear
            # NotImplementedError instead of silently faking
            try:
                from PIL import Image  # noqa: PLC0415

                self._pil = Image
            except ImportError:
                self._pil = None
            try:
                import av  # noqa: PLC0415  (PyAV ffmpeg bindings)

                self._av = av
            except ImportError:
                self._av = None

    def _decode_image(self, payload: bytes) -> np.ndarray:
        """Real image path (requires PIL): decode -> 8x8 grayscale ->
        standardized pixel vector (FEATURE_DIM = 64 = 8*8)."""
        if self._pil is None:
            raise NotImplementedError(
                "image decode requires PIL, which is not importable here; "
                "construct MediaFeatureExtractor(deterministic_fake=True) "
                "for the plumbing path"
            )
        import io

        img = self._pil.open(io.BytesIO(payload)).convert("L").resize((8, 8))
        px = np.asarray(img, dtype=np.float64).ravel()
        return (px - px.mean()) / (px.std() + 1e-9)

    def _decode_audio(self, payload: bytes) -> np.ndarray:
        """Real audio path (stdlib ``wave`` — always available): parse the
        RIFF/WAVE payload, downmix to mono, emit FEATURE_DIM equal-span
        mean-|amplitude| buckets."""
        import io
        import wave

        try:
            with wave.open(io.BytesIO(payload)) as w:
                sw = w.getsampwidth()
                nch = w.getnchannels()
                raw = w.readframes(w.getnframes())
        except (wave.Error, EOFError) as e:
            raise NotImplementedError(
                f"audio payload is not RIFF/WAVE ({e}); only WAV decode is "
                "available without external audio libraries"
            ) from e
        dt = {1: np.uint8, 2: np.int16, 4: np.int32}.get(sw)
        if dt is None:
            raise NotImplementedError(f"unsupported WAV sample width {sw}")
        x = np.frombuffer(raw, dtype=dt).astype(np.float64)
        if sw == 1:
            x -= 128.0
        if nch > 1:
            x = x[: (x.shape[0] // nch) * nch].reshape(-1, nch).mean(axis=1)
        n = x.shape[0]
        out = np.zeros(FEATURE_DIM, dtype=np.float64)
        if n == 0:
            return out
        edges = (np.arange(FEATURE_DIM + 1, dtype=np.int64) * n) // FEATURE_DIM
        lens = np.diff(edges)
        nzb = lens > 0
        sums = np.add.reduceat(np.abs(x), edges[:-1][nzb]) if nzb.any() else np.empty(0)
        out[nzb] = sums / lens[nzb]
        return out

    def _decode(self, payload: bytes, kind: str) -> np.ndarray:
        if self.fake:
            # deterministic fake: FEATURE_DIM equal-span byte-bucket MEANS
            # of the raw payload — the audio path's feature shape applied
            # to the bytes themselves.  A real (if trivial) feature
            # extraction that exercises the full Ray plumbing without
            # media libs, and is exactly replayable by the SQL value
            # oracle (bucket sums are small ints; means over the 64-byte
            # buckets of the 4096-byte synth payloads are exact dyadic
            # float32s).
            b = np.frombuffer(payload, dtype=np.uint8).astype(np.float64)
            n = b.shape[0]
            out = np.zeros(FEATURE_DIM, dtype=np.float64)
            if n:
                edges = (np.arange(FEATURE_DIM + 1, dtype=np.int64) * n) \
                    // FEATURE_DIM
                lens = np.diff(edges)
                nzb = lens > 0
                out[nzb] = np.add.reduceat(b, edges[:-1][nzb]) / lens[nzb]
            return out
        if kind == "image":
            return self._decode_image(payload)
        if kind == "audio":
            return self._decode_audio(payload)
        if kind == "video":
            return self._decode_video(payload)
        raise NotImplementedError(f"unknown media kind {kind!r}")

    _VIDEO_SAMPLE_FRAMES = 8

    def _decode_video(self, payload: bytes) -> np.ndarray:
        """Real video path (requires PyAV/ffmpeg, optional like PIL):
        decode the container's first video stream, evenly frame-sample up
        to ``_VIDEO_SAMPLE_FRAMES`` frames, reduce each to an 8x8
        grayscale tile and average the standardized tiles (FEATURE_DIM =
        64).  Without the bindings this raises instead of silently
        faking."""
        if self._av is None:
            raise NotImplementedError(
                "video decode requires PyAV (ffmpeg bindings), which is "
                "not importable here; construct MediaFeatureExtractor("
                "deterministic_fake=True) for the plumbing path"
            )
        import io

        frames = []
        with self._av.open(io.BytesIO(payload)) as container:
            stream = container.streams.video[0]
            for frame in container.decode(stream):
                frames.append(frame.to_ndarray(format="gray"))
        if not frames:
            return np.zeros(FEATURE_DIM, dtype=np.float64)
        k = min(self._VIDEO_SAMPLE_FRAMES, len(frames))
        picks = (np.arange(k, dtype=np.int64) * len(frames)) // k
        acc = np.zeros(FEATURE_DIM, dtype=np.float64)
        for p in picks:
            g = frames[int(p)].astype(np.float64)
            h, w = g.shape
            # 8x8 block means via integer-edge reduceat on both axes
            ye = (np.arange(9, dtype=np.int64) * h) // 8
            xe = (np.arange(9, dtype=np.int64) * w) // 8
            rows = np.add.reduceat(g, ye[:-1], axis=0)
            tile = np.add.reduceat(rows, xe[:-1], axis=1)
            tile /= np.outer(np.maximum(np.diff(ye), 1),
                             np.maximum(np.diff(xe), 1))
            v = tile.ravel()
            acc += (v - v.mean()) / (v.std() + 1e-9)
        return acc / k

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
        doc_ids = batch.column("doc_id").to_pylist()
        ids = [str(d) for d in doc_ids]
        payloads = []
        kinds = []
        # kind keys off doc_id, not the batch-local index — deterministic
        # under any block layout (the SQL oracle replays doc_id % 3)
        for d, t in zip(doc_ids, batch.column("text").to_pylist()):
            b = (t.encode("utf-8") * (payload_bytes // max(1, len(t)) + 1))[:payload_bytes]
            payloads.append(b)
            kinds.append(("image", "audio", "video")[int(d) % 3])
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


def media_feature_summary(sf_dir: str):
    """The DRIVER-VERIFIED surface of the media path: the same actor-pool
    feature extraction as :func:`media_features`, reduced per media row to
    exact-integer bucket-sum summaries so a DuckDB oracle can value-check
    the decode end-to-end.  The synth payload is 4096 bytes and the fake
    feature is the 64-byte-bucket mean, so ``feature * 64`` recovers the
    integer bucket sum exactly (bucket sums < 2^24: float32-exact)."""

    def summarize(batch: pa.Table) -> pa.Table:
        f = batch.column("features")
        if isinstance(f, pa.ChunkedArray):
            f = f.combine_chunks()
        n = batch.num_rows
        vals = np.asarray(f.values, dtype=np.float32).reshape(n, FEATURE_DIM)
        bs = np.rint(vals.astype(np.float64) * 64.0).astype(np.int64)
        w = np.arange(1, FEATURE_DIM + 1, dtype=np.int64)
        return pa.table({
            "media_id": batch.column("media_id"),
            "kind": batch.column("kind"),
            "byte_sum": pa.array(bs.sum(axis=1), type=pa.int64()),
            "wsum": pa.array((bs * w).sum(axis=1), type=pa.int64()),
            "bucket_min": pa.array(bs.min(axis=1), type=pa.int64()),
            "bucket_max": pa.array(bs.max(axis=1), type=pa.int64()),
        })

    return media_features(sf_dir).map_batches(
        summarize, batch_format="pyarrow", zero_copy_batch=True)
