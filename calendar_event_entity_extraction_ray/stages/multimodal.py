"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata.

Image/audio decode libraries are not available in this environment, so the
DECODE KERNEL is stubbed (deterministic md5-derived fake features, or
``NotImplementedError`` in strict mode) — but the Ray-side plumbing is real
and tested: binary columns stay in ``batch_format="pyarrow"`` end-to-end
(no pandas object-dtype round-trip), the stage is an actor pool (a real
decoder would load codecs/models once per actor), and ``batch_size`` is
small because payload rows are wide (ray_guide.md "Pitfalls": memory-aware
batch sizing for binary columns).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),        # image | audio | video
        ("payload", pa.binary()),
        ("mime", pa.string()),
        ("width", pa.int32()),        # typed metadata (nullable)
        ("height", pa.int32()),
        ("duration_ms", pa.int32()),
    ]
)


class DecodeFeatures:
    """Actor-pool stage: binary payload -> fixed-size feature vector.

    ``strict=True`` raises NotImplementedError (no decoder in this
    container); default emits a deterministic md5-derived fake feature so
    the downstream plumbing (schema, batching, partitioning) is testable.
    """

    def __init__(self, feature_dim: int = 16, strict: bool = False) -> None:
        self.dim = feature_dim
        self.strict = strict

    def _fake_feature(self, payload: bytes) -> np.ndarray:
        digest = hashlib.md5(payload or b"").digest()
        rng = np.random.RandomState(int.from_bytes(digest[:4], "little"))
        return rng.standard_normal(self.dim).astype(np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.strict:
            raise NotImplementedError(
                "real image/audio decode requires codec libraries not present "
                "in this environment; run with strict=False for the "
                "deterministic stub"
            )
        feats = [self._fake_feature(p) for p in batch.column("payload").to_pylist()]
        out = batch.drop_columns(["payload"])  # features replace wide bytes
        return out.append_column(
            "feature",
            pa.array([f.tolist() for f in feats], pa.list_(pa.float32(), self.dim)),
        )


class ResizeImages:
    """Actor-pool stage: image payload -> resized payload + updated typed
    metadata. The pixel kernel is STUBBED (no codec libs in this container:
    deterministic md5-derived bytes of the right length); the Ray-side
    mechanics are real — binary in/out stays Arrow, width/height metadata
    updated, small batches for wide rows."""

    def __init__(self, width: int = 64, height: int = 64, strict: bool = False):
        self.w, self.h, self.strict = width, height, strict

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.strict:
            raise NotImplementedError("image resize needs a codec library")
        out_payload = []
        for p, kind in zip(batch.column("payload").to_pylist(),
                           batch.column("kind").to_pylist()):
            if kind != "image":
                out_payload.append(p)
                continue
            seed_bytes = hashlib.md5((p or b"") + b"resize").digest()
            reps = (self.w * self.h * 3) // 16 + 1
            out_payload.append((seed_bytes * reps)[: self.w * self.h * 3])
        names = batch.column_names
        batch = batch.set_column(names.index("payload"), "payload",
                                 pa.array(out_payload, pa.binary()))
        n = batch.num_rows
        kinds = batch.column("kind").to_pylist()
        batch = batch.set_column(
            names.index("width"), "width",
            pa.array([self.w if k == "image" else None for k in kinds], pa.int32()))
        return batch.set_column(
            names.index("height"), "height",
            pa.array([self.h if k == "image" else None for k in kinds], pa.int32()))


def frame_sample_batch(batch: pa.Table, every_ms: int = 500) -> pa.Table:
    """Stateless flat explosion: one row per sampled frame of each video
    (deterministic fake frame ids; a real decoder would seek). Shows the
    1->N binary-row expansion pattern with bounded output per row."""
    out = {"media_id": [], "frame_ix": [], "frame_ts_ms": [], "frame": []}
    for mid, kind, payload, dur in zip(
        batch.column("media_id").to_pylist(), batch.column("kind").to_pylist(),
        batch.column("payload").to_pylist(), batch.column("duration_ms").to_pylist(),
    ):
        if kind != "video" or not dur:
            continue
        n_frames = min(dur // every_ms + 1, 64)  # cap per-row output
        for i in range(n_frames):
            out["media_id"].append(mid)
            out["frame_ix"].append(i)
            out["frame_ts_ms"].append(i * every_ms)
            out["frame"].append(hashlib.md5((payload or b"") + bytes([i])).digest())
    return pa.table({
        "media_id": pa.array(out["media_id"], pa.int64()),
        "frame_ix": pa.array(out["frame_ix"], pa.int32()),
        "frame_ts_ms": pa.array(out["frame_ts_ms"], pa.int32()),
        "frame": pa.array(out["frame"], pa.binary()),
    })


def synth_media_table(n: int, seed: int = 42) -> pa.Table:
    """Deterministic fake media rows (payload = seeded bytes)."""
    rows = {k: [] for k in ("media_id", "kind", "payload", "mime",
                            "width", "height", "duration_ms")}
    kinds = [("image", "image/png"), ("audio", "audio/wav"), ("video", "video/mp4")]
    for i in range(n):
        kind, mime = kinds[i % 3]
        payload = hashlib.md5(f"media:{seed}:{i}".encode()).digest() * (4 + i % 5)
        rows["media_id"].append(i)
        rows["kind"].append(kind)
        rows["payload"].append(payload)
        rows["mime"].append(mime)
        rows["width"].append(64 + (i % 8) * 16 if kind == "image" else None)
        rows["height"].append(48 + (i % 6) * 16 if kind == "image" else None)
        rows["duration_ms"].append(1000 + i * 37 if kind != "image" else None)
    return pa.table(
        {
            "media_id": pa.array(rows["media_id"], pa.int64()),
            "kind": pa.array(rows["kind"], pa.string()),
            "payload": pa.array(rows["payload"], pa.binary()),
            "mime": pa.array(rows["mime"], pa.string()),
            "width": pa.array(rows["width"], pa.int32()),
            "height": pa.array(rows["height"], pa.int32()),
            "duration_ms": pa.array(rows["duration_ms"], pa.int32()),
        }
    )
