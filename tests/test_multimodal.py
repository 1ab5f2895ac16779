"""Multimodal plumbing: binary payload columns through actor-pool
stages.  The codec is stubbed (FakeCodec); the Ray mechanics — schema,
actor construction, explosion layout, determinism under partitioning —
are the subject under test."""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from information_extraction_t5_ray.stages import multimodal as mm

SF = "/root/testdata/sf0.001"


def _media_ds(limit=None):
    import ray.data as rd

    ds = rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id"])
    ds = ds.map_batches(mm.attach_payload, batch_format="pyarrow")
    return ds


def test_payload_schema_and_roundtrip(ray_session):
    t = _media_ds().take_batch(5, batch_format="pyarrow")
    assert t.schema.field("payload").type == "binary"
    img = mm.FakeCodec().decode(t["payload"][0].as_py())
    assert img.shape == (48, 48, 3)
    # deterministic by doc_id
    img2 = mm.FakeCodec().decode(
        mm.encode_fake_image(48, 48, 3, seed=int(t["doc_id"][0].as_py()) % 100000)
    )
    assert (img == img2).all()


def test_feature_extractor_actor_stage(ray_session):
    feats = mm.media_features_stage(_media_ds()).to_pandas()
    assert len(feats) == 500
    dim = feats["feature_dim"].unique()
    assert list(dim) == [16 * 3]
    v = np.array(feats["feature"].iloc[0])
    assert abs(np.linalg.norm(v) - 1.0) < 1e-9
    # determinism: same doc -> same feature under a different batch size
    feats2 = mm.media_features_stage(_media_ds(), batch_size=7).to_pandas()
    a = feats.sort_values("doc_id").reset_index(drop=True)
    b = feats2.sort_values("doc_id").reset_index(drop=True)
    assert all(
        np.allclose(x, y) for x, y in zip(a["feature"], b["feature"])
    )


def test_frame_sampling_explosion(ray_session):
    frames = mm.frame_sample_stage(_media_ds(), every_k=16).to_pandas()
    # 48-row images sampled every 16 -> 3 frames per doc
    assert len(frames) == 500 * 3
    per_doc = frames.groupby("doc_id")["frame_id"].apply(list)
    assert all(v == [0, 16, 32] for v in per_doc)
    assert all(len(f) == 48 * 3 for f in frames["frame"].head(10))


def test_library_codec_raises_clearly():
    with pytest.raises((NotImplementedError, Exception)) as ei:
        mm.LibraryCodec().decode(b"\x89PNG....")
    # either Pillow is absent (NotImplementedError with guidance) or the
    # payload is invalid — both must be loud, never a silent fallback
    assert ei.value is not None
