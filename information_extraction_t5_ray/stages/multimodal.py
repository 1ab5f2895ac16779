"""Multimodal (image/audio/video) column plumbing.

Treats media as opaque ``binary`` payload columns with typed metadata,
the way a 100 TB crawl pipeline would carry them next to text.  The
Ray-side mechanics — schema, actor-pool stage shape, small batch sizes
for large payloads, output layout — are real and tested; the actual
codec work is STUBBED (this container ships no image/audio libraries):

* ``FakeCodec``   — deterministic stand-in: parses the tiny header the
                    synthesizer writes and "decodes" to a shaped array.
* ``LibraryCodec``— the real path: imports PIL/soundfile lazily and
                    raises ``NotImplementedError`` with a clear message
                    when the library is absent.

Stages:

* ``attach_payload``      — derive a deterministic binary payload per
                            row (synth source for tests/bench).
* ``MediaFeatureExtractor``— actor-pool ``map_batches`` class: decode ->
                            per-channel byte-histogram features ->
                            fixed-length ``list<float>`` feature column
                            (the embedding-rerank input shape).
* ``frame_sample_stage``  — video-style: emit every k-th "frame" of a
                            payload as its own row (flat_map explosion,
                            the windows-per-doc pattern for media).

Batch sizing: payloads here are ~64 KiB; a real pipeline with MB-scale
media must drop ``batch_size`` so batch x concurrency fits the worker
heap (see DataContext.target_max_block_size note in SURVEY.md §4).
"""

from __future__ import annotations

import struct
from typing import Optional

import numpy as np
import pyarrow as pa

MAGIC = b"FIMG"  # fake-image container: MAGIC | u16 h | u16 w | u8 c | data


def encode_fake_image(h: int, w: int, c: int, seed: int) -> bytes:
    rng = np.random.RandomState(seed)
    data = rng.randint(0, 256, size=h * w * c, dtype=np.uint8).tobytes()
    return MAGIC + struct.pack("<HHB", h, w, c) + data


class FakeCodec:
    """Deterministic decode of the FIMG container -> (h, w, c) uint8."""

    def decode(self, payload: bytes) -> np.ndarray:
        if payload[:4] != MAGIC:
            raise ValueError("not a FIMG payload")
        h, w, c = struct.unpack("<HHB", payload[4:9])
        arr = np.frombuffer(payload[9:], dtype=np.uint8)
        return arr.reshape(h, w, c)


class LibraryCodec:
    """Real-image path; the decode libraries are not in this container,
    so this raises with a clear action instead of silently degrading."""

    def decode(self, payload: bytes) -> np.ndarray:
        try:
            import io

            from PIL import Image  # noqa: F401
        except ImportError as e:
            raise NotImplementedError(
                "image decode requires Pillow, which is not installed in "
                "this environment; use FakeCodec for plumbing tests or "
                "install Pillow in the cluster image"
            ) from e
        import io

        from PIL import Image

        return np.asarray(Image.open(io.BytesIO(payload)))


def attach_payload(batch: pa.Table, h: int = 48, w: int = 48, c: int = 3) -> pa.Table:
    """Synth source: deterministic payload per doc_id + typed metadata."""
    ids = batch["doc_id"].to_numpy()
    payloads = [encode_fake_image(h, w, c, seed=int(d) % 100000) for d in ids]
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "payload": pa.array(payloads, pa.binary()),
            "media_type": pa.array(["image/fimg"] * len(ids), pa.string()),
            "height": pa.array([h] * len(ids), pa.int32()),
            "width": pa.array([w] * len(ids), pa.int32()),
        }
    )


def attach_varied_payload(batch: pa.Table) -> pa.Table:
    """Synth source with per-doc dimensions (h = 16 + (doc_id % 5) * 8,
    w = 16 + (doc_id % 7) * 8, c = 1 + doc_id % 3) — closed-form in
    doc_id so a SQL oracle can independently predict what the decoder
    must find inside the bytes."""
    ids = batch["doc_id"].to_numpy()
    payloads = []
    for d in ids:
        d = int(d)
        payloads.append(
            encode_fake_image(
                16 + (d % 5) * 8, 16 + (d % 7) * 8, 1 + d % 3, seed=d % 100000
            )
        )
    return pa.table(
        {"doc_id": batch["doc_id"], "payload": pa.array(payloads, pa.binary())}
    )


def media_meta_stage(media_ds, batch_size: int = 256):
    """Decode-side metadata extraction: every value comes from PARSING
    the payload bytes (the FakeCodec header route — the same code path
    a real container probe takes), none from passthrough columns, so an
    oracle that predicts (height, width, channels, n_bytes) from doc_id
    arithmetic verifies the encode->ship->decode round-trip.  Per-row
    struct parse is header-bounded (9 bytes), not payload-sized."""

    def meta(batch: pa.Table) -> pa.Table:
        hs, ws, cs, nb = [], [], [], []
        for p in batch["payload"].to_pylist():
            if p[:4] != MAGIC:
                raise ValueError("not a FIMG payload")
            h, w, c = struct.unpack("<HHB", p[4:9])
            hs.append(h)
            ws.append(w)
            cs.append(c)
            nb.append(len(p))
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "height": pa.array(hs, pa.int64()),
                "width": pa.array(ws, pa.int64()),
                "channels": pa.array(cs, pa.int64()),
                "n_bytes": pa.array(nb, pa.int64()),
            }
        )

    return media_ds.map_batches(
        meta, batch_format="pyarrow", batch_size=batch_size
    )


class MediaFeatureExtractor:
    """Actor-pool stage: codec constructed ONCE per actor (the
    model-load slot); per-batch work is decode + vectorized histogram."""

    def __init__(self, codec: Optional[str] = "fake", bins: int = 16):
        self.codec = FakeCodec() if codec == "fake" else LibraryCodec()
        self.bins = bins
        self.edges = np.linspace(0, 256, bins + 1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats, masses = [], []
        for payload in batch["payload"].to_pylist():
            img = self.codec.decode(payload)
            per_ch = [
                np.histogram(img[..., ch], bins=self.edges)[0]
                for ch in range(img.shape[-1])
            ]
            v = np.concatenate(per_ch).astype(np.float64)
            # pre-normalization histogram MASS == total decoded pixels
            # (h*w*c): the decode-completeness invariant a SQL oracle
            # can predict from the payload dimensions
            masses.append(int(v.sum()))
            n = np.linalg.norm(v)
            feats.append((v / n if n else v).tolist())
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "feature": pa.array(feats, pa.list_(pa.float64())),
                "feature_dim": pa.array(
                    [len(f) for f in feats], pa.int32()
                ),
                "hist_mass": pa.array(masses, pa.int64()),
            }
        )


def media_features_stage(
    media_ds,
    codec: str = "fake",
    bins: int = 16,
    concurrency=(1, 4),
    batch_size: int = 64,  # small on purpose: payload batches are heavy
):
    return media_ds.map_batches(
        MediaFeatureExtractor,
        fn_constructor_kwargs={"codec": codec, "bins": bins},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def frame_sample_batch(batch: pa.Table, every_k: int = 4) -> pa.Table:
    """Video-style frame sampling: treat each image row of height H as H
    'frames' and emit every k-th row-slice as its own output row (the
    1-doc -> N-windows explosion shape for media)."""
    codec = FakeCodec()
    ids, frame_ids, frames = [], [], []
    for d, payload in zip(batch["doc_id"].to_pylist(), batch["payload"].to_pylist()):
        img = codec.decode(payload)
        for fi in range(0, img.shape[0], every_k):
            ids.append(d)
            frame_ids.append(fi)
            frames.append(img[fi].tobytes())
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "frame_id": pa.array(frame_ids, pa.int32()),
            "frame": pa.array(frames, pa.binary()),
        }
    )


def frame_sample_stage(media_ds, every_k: int = 4, batch_size: int = 64):
    return media_ds.map_batches(
        lambda b: frame_sample_batch(b, every_k),
        batch_format="pyarrow",
        batch_size=batch_size,
    )
