"""Multimodal columns: media spans as opaque refs/bytes with typed
metadata, decoded by an actor-pool stage.

The real decoders (PIL / ffmpeg / torchaudio) are not in this container,
so ``MediaDecodeStub`` is the clearly-marked deterministic fake: metadata
is derived from the md5 of the media_ref (SQL-replicable so even the
stub is oracle-checked).  The Ray-side plumbing — actor pool, batch
shape, output schema — is the real, tested scale path; swap ``_decode``
for a real decoder to productionize.
"""

from __future__ import annotations

import pyarrow as pa

import ray.data

from ..functions.hashing import md5int60


class MediaDecodeStub:
    """Actor-pool stage: 'model load' happens once per actor in __init__
    (here: nothing to load — the stub is pure); __call__ is per batch."""

    def __init__(self) -> None:
        # A real decoder would open the codec / load the vision model here.
        self.ready = True

    @staticmethod
    def _decode(media_ref: str) -> tuple[int, int, int]:
        """STUB: deterministic fake decode.  Raises NotImplementedError for
        refs outside the media:// scheme (a real decoder would fetch)."""
        if not media_ref.startswith("media://"):
            raise NotImplementedError(f"no fetcher for {media_ref!r}")
        h = md5int60(media_ref)
        width = 64 + h % 1024
        height = 64 + (h // 1024) % 1024
        n_frames = 1 + (h // (1024 * 1024)) % 16
        return width, height, n_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs = batch.column("media_ref").to_pylist()
        meta = [self._decode(r) for r in refs]
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "span_idx": batch.column("span_idx"),
                "media_ref": batch.column("media_ref"),
                "width": pa.array([m[0] for m in meta], pa.int64()),
                "height": pa.array([m[1] for m in meta], pa.int64()),
                "n_frames": pa.array([m[2] for m in meta], pa.int64()),
            }
        )


def extract_media_spans(documents: ray.data.Dataset) -> ray.data.Dataset:
    """documents → (doc_id, span_idx, media_ref) for kind='media' spans.
    Like OSM span extraction, this never mutates the source rows (span
    invariant)."""

    def f(t: pa.Table) -> pa.Table:
        out = {"doc_id": [], "span_idx": [], "media_ref": []}
        for doc_id, spans in zip(t.column("doc_id").to_pylist(), t.column("spans").to_pylist()):
            for si, s in enumerate(spans or []):
                if s["kind"] == "media":
                    out["doc_id"].append(doc_id)
                    out["span_idx"].append(si)
                    out["media_ref"].append(s["media_ref"])
        return pa.table(
            {
                "doc_id": pa.array(out["doc_id"], pa.string()),
                "span_idx": pa.array(out["span_idx"], pa.int64()),
                "media_ref": pa.array(out["media_ref"], pa.string()),
            }
        )

    return documents.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def media_features(documents: ray.data.Dataset, concurrency=(1, 4)) -> ray.data.Dataset:
    """The full media pipeline: span extraction → actor-pool decode."""
    spans = extract_media_spans(documents)
    return spans.map_batches(MediaDecodeStub, batch_format="pyarrow", concurrency=concurrency)
