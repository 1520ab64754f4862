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
        # vectorized flatten + kind filter (same shape as
        # sources.documents.extract_elements_batch) — no per-doc loop
        import numpy as np
        import pyarrow.compute as pc

        spans = t.column("spans").combine_chunks()
        lens = np.asarray(spans.value_lengths().fill_null(0), dtype=np.int64)
        total = int(lens.sum())
        if total == 0:
            return pa.table(
                {"doc_id": pa.array([], pa.string()),
                 "span_idx": pa.array([], pa.int64()),
                 "media_ref": pa.array([], pa.string())}
            )
        row = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
        span_idx = np.concatenate([np.arange(n, dtype=np.int64) for n in lens])
        flat = spans.flatten()
        mask = pc.equal(flat.field("kind"), "media")
        mask_np = np.asarray(mask.combine_chunks() if isinstance(mask, pa.ChunkedArray) else mask)
        sel = np.nonzero(mask_np)[0]
        doc = t.column("doc_id").combine_chunks()
        return pa.table(
            {
                "doc_id": doc.take(pa.array(row[sel])),
                "span_idx": pa.array(span_idx[sel], pa.int64()),
                "media_ref": flat.field("media_ref").take(pa.array(sel)),
            }
        )

    return documents.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def media_features(documents: ray.data.Dataset, concurrency=(1, 4)) -> ray.data.Dataset:
    """The full media pipeline: span extraction → actor-pool decode.

    The stub actors declare ``num_cpus=0.5``: the stub's work is hash
    arithmetic, and an honest fractional claim keeps a 2-CPU cluster
    live — with the default 1.0, the two chained pools' MINIMUM actors
    (decode + embed) held both cores and the upstream read tasks could
    never schedule (observed livelock in the 2-CPU sweep).  A real
    codec-holding decoder should claim its true core count here."""
    spans = extract_media_spans(documents)
    return spans.map_batches(
        MediaDecodeStub, batch_format="pyarrow", concurrency=concurrency, num_cpus=0.5
    )


TARGET_EDGE = 224  # longest-side resize target (ViT-style preprocessing)
FRAMES_PER_CLIP = 4


def resize_plan(decoded: ray.data.Dataset) -> ray.data.Dataset:
    """Decoded media → aspect-preserving resize plan (longest side →
    ``TARGET_EDGE``), pure integer arithmetic so the plan is bit-stable
    vs SQL.  A REAL resize is this same chained stage with the pixel
    buffer flowing through and an actor pool holding the codec; the
    stub keeps the plumbing (schema, chaining, vectorization) and
    computes only the geometry."""
    import numpy as np

    def f(t: pa.Table) -> pa.Table:
        w = np.asarray(t.column("width"), dtype=np.int64)
        h = np.asarray(t.column("height"), dtype=np.int64)
        long_side = np.maximum(w, h)
        out_w = np.maximum(1, (w * TARGET_EDGE) // long_side)
        out_h = np.maximum(1, (h * TARGET_EDGE) // long_side)
        return t.append_column("out_width", pa.array(out_w)).append_column(
            "out_height", pa.array(out_h)
        )

    return decoded.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def sample_frames(
    decoded: ray.data.Dataset, k: int = FRAMES_PER_CLIP
) -> ray.data.Dataset:
    """Uniform frame sampling: per media span with ``n_frames`` frames,
    emit min(k, n_frames) rows with ``frame_idx`` = floor(i·n/k) (all
    frames when the clip is shorter than k).  Row explosion is
    vectorized repeat+offsets — the same flatten shape as span
    extraction, no per-row loop."""
    import numpy as np

    def f(t: pa.Table) -> pa.Table:
        n = np.asarray(t.column("n_frames"), dtype=np.int64)
        counts = np.minimum(n, k)
        row = np.repeat(np.arange(len(n), dtype=np.int64), counts)
        starts = np.cumsum(counts) - counts
        i = np.arange(int(counts.sum()), dtype=np.int64) - np.repeat(starts, counts)
        nf = n[row]
        frame_idx = np.where(nf >= k, (i * nf) // k, i)
        out = t.take(pa.array(row))
        return out.append_column("frame_idx", pa.array(frame_idx))

    return decoded.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def media_frames(documents: ray.data.Dataset, concurrency=(1, 4)) -> ray.data.Dataset:
    """Full media chain: span extraction → actor-pool decode → resize
    plan → uniform frame sample; one row per sampled frame."""
    return sample_frames(resize_plan(media_features(documents, concurrency=concurrency)))


EMBED_DIM = 16


class FrameEmbedStub:
    """Feature-extraction stage (actor pool): per sampled frame, a
    deterministic EMBED_DIM-vector.  STUB: components are md5-derived
    from (media_ref, frame_idx, i) — SQL-replicable so even the fake
    extractor is oracle-checked; a REAL extractor is this same actor
    signature with the vision model loaded in ``__init__`` and batched
    inference in ``__call__`` (the per-row md5 loop is the stub's
    disclosed cost, exactly like the text fingerprint family)."""

    def __init__(self) -> None:
        # real impl: load the vision model here, once per actor
        self.dim = EMBED_DIM

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs = batch.column("media_ref").to_pylist()
        frames = batch.column("frame_idx").to_pylist()
        vals = [
            (md5int60(f"{r}:{f}:{i}") % 1000) / 1000.0
            for r, f in zip(refs, frames)
            for i in range(self.dim)
        ]
        emb = pa.FixedSizeListArray.from_arrays(
            pa.array(vals, pa.float64()), self.dim
        )
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "span_idx": batch.column("span_idx"),
                "media_ref": batch.column("media_ref"),
                "frame_idx": batch.column("frame_idx"),
                "embedding": emb,
            }
        )


def media_frame_embeddings(
    documents: ray.data.Dataset, concurrency=(1, 4)
) -> ray.data.Dataset:
    """The full 4-stage multimodal chain: span extraction → decode →
    resize plan → frame sample → per-frame feature extraction."""
    return media_frames(documents, concurrency=concurrency).map_batches(
        FrameEmbedStub, batch_format="pyarrow", concurrency=concurrency, num_cpus=0.5
    )
