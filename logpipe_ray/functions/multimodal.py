"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are carried as Arrow `binary` columns with typed
metadata columns (mime, width/height or sample_rate, n_frames). The
Ray-side plumbing — schema, small batch sizes for wide rows, actor-pool
stages with per-actor decoder state, output layout — is real and
tested. Byte decoding: `decode="fake"` computes deterministic features
from the payload bytes (always available); `decode="real"` is guarded
by importlib.util.find_spec — environments with Pillow / PyAV
installed run the real PIL/libav path (loaded once per actor in
__init__), while this sandbox (no image/audio libraries) raises
NotImplementedError at actor construction.

Batch-size guidance (SURVEY.md §7.4 "wide rows"): size batches by
payload budget, not row count — `batch_size ~= budget_bytes /
avg_payload`; the helpers here default to 256 rows for ~64 KiB
payloads.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data import Dataset

MM_SCHEMA = pa.schema(
    [
        ("item_id", pa.int64()),
        ("payload", pa.binary()),
        ("mime", pa.string()),
        ("width", pa.int32()),
        ("height", pa.int32()),
    ]
)


def synthesize_media_table(n: int, seed: int = 42, payload_bytes: int = 4096) -> pa.Table:
    """Deterministic fake media corpus (seeded bytes; no external data)."""
    rng = np.random.default_rng(seed)
    payloads = [rng.bytes(payload_bytes + int(rng.integers(0, 512))) for _ in range(n)]
    widths = rng.integers(64, 1025, n).astype(np.int32)
    heights = rng.integers(64, 1025, n).astype(np.int32)
    mimes = np.array(["image/png", "image/jpeg"], dtype=object)[
        rng.integers(0, 2, n)
    ]
    return pa.table(
        {
            "item_id": pa.array(np.arange(n, dtype=np.int64)),
            "payload": pa.array(payloads, pa.binary()),
            "mime": pa.array(mimes, pa.string()),
            "width": pa.array(widths),
            "height": pa.array(heights),
        }
    )


class MediaFeatureStage:
    """Actor-pool stage: decode + feature-extract media payloads.

    __init__ loads the (stubbed) decoder once per actor — the pattern a
    real model/codec load would follow. __call__ is per batch.

    decode="fake": deterministic per-item features from the raw bytes
    (mean/std of the payload, aspect ratio) — keeps the full pipeline
    shape testable. decode="real": raises NotImplementedError where a
    real decoder (PIL.Image.open / av.open) would run.
    """

    def __init__(self, decode: str = "fake"):
        self.decode = decode
        if decode == "real":
            # decoder loaded ONCE per actor; environments with Pillow
            # installed get the real path, this sandbox raises here
            import importlib.util

            if importlib.util.find_spec("PIL") is None:
                raise NotImplementedError(
                    "real media decoding requires PIL (pip install pillow), "
                    "not present in this environment; use decode='fake' for "
                    "the deterministic stub"
                )
            from PIL import Image

            self._Image = Image

    def _real_features(self, batch: pa.Table) -> pa.Table:
        import io

        widths, heights, means, stds, nbytes = [], [], [], [], []
        for buf in batch["payload"].to_pylist():
            img = self._Image.open(io.BytesIO(buf)).convert("L")
            px = np.asarray(img, dtype=np.float64)
            widths.append(img.width)
            heights.append(img.height)
            means.append(float(px.mean()))
            stds.append(float(px.std()))
            nbytes.append(len(buf))
        out = batch.drop(["payload"])
        out = out.append_column("payload_bytes", pa.array(nbytes, pa.int64()))
        out = out.append_column("byte_mean", pa.array(means))
        out = out.append_column("byte_std", pa.array(stds))
        out = out.append_column(
            "aspect_ratio",
            pa.array(np.array(widths) / np.maximum(np.array(heights), 1)),
        )
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        payload = batch["payload"]
        if isinstance(payload, pa.ChunkedArray):
            payload = payload.combine_chunks()
        if self.decode == "real":
            return self._real_features(batch)
        # vectorized over the flat binary buffer
        n = len(payload)
        offsets = np.frombuffer(
            payload.buffers()[1], dtype=np.int32, count=n + 1,
            offset=payload.offset * 4,
        ).astype(np.int64)
        data = np.frombuffer(payload.buffers()[2], dtype=np.uint8)
        sums = np.add.reduceat(data.astype(np.float64), offsets[:-1])
        lengths = (offsets[1:] - offsets[:-1]).astype(np.float64)
        mean = sums / np.maximum(lengths, 1)
        sq = np.add.reduceat((data.astype(np.float64)) ** 2, offsets[:-1])
        var = sq / np.maximum(lengths, 1) - mean**2
        aspect = np.asarray(batch["width"], dtype=np.float64) / np.maximum(
            np.asarray(batch["height"], dtype=np.float64), 1
        )
        out = batch.drop(["payload"])  # features replace the heavy bytes
        out = out.append_column("payload_bytes", pa.array(lengths.astype(np.int64)))
        out = out.append_column("byte_mean", pa.array(mean))
        out = out.append_column("byte_std", pa.array(np.sqrt(np.maximum(var, 0))))
        out = out.append_column("aspect_ratio", pa.array(aspect))
        return out


def media_features(
    ds: Dataset, decode: str = "fake", concurrency=(1, 4), batch_size: int = 256
) -> Dataset:
    """Attach the media feature stage as an actor pool (small batches —
    wide binary rows; see module docstring)."""
    return ds.map_batches(
        MediaFeatureStage,
        fn_constructor_kwargs={"decode": decode},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        zero_copy_batch=True,
    )


VIDEO_SCHEMA = pa.schema(
    [
        ("item_id", pa.int64()),
        ("payload", pa.binary()),
        ("mime", pa.string()),
        ("n_frames", pa.int32()),
        ("fps", pa.float32()),
    ]
)


def synthesize_video_table(n: int, seed: int = 7, frame_bytes: int = 256) -> pa.Table:
    """Deterministic fake video corpus: payload = n_frames fixed-size
    'frames' of seeded bytes."""
    rng = np.random.default_rng(seed)
    n_frames = rng.integers(8, 121, n).astype(np.int32)
    payloads = [rng.bytes(int(f) * frame_bytes) for f in n_frames]
    return pa.table(
        {
            "item_id": pa.array(np.arange(n, dtype=np.int64)),
            "payload": pa.array(payloads, pa.binary()),
            "mime": pa.array(["video/mp4"] * n, pa.string()),
            "n_frames": pa.array(n_frames),
            "fps": pa.array(np.full(n, 24.0, np.float32)),
        }
    )


class MediaResizeStage:
    """Actor-pool stage: resize images to a target box.

    decode="fake" transforms metadata exactly as a real resize would
    (aspect-preserving fit into target_w x target_h, recorded in new
    width/height columns) and re-emits a deterministic payload whose
    size scales with the area ratio — the schema/size behavior of the
    real op without the codec. decode="real" raises at the exact PIL
    call site."""

    def __init__(self, target_w: int = 256, target_h: int = 256, decode: str = "fake"):
        self.tw, self.th = target_w, target_h
        self.decode = decode
        if decode == "real":
            import importlib.util

            if importlib.util.find_spec("PIL") is None:
                raise NotImplementedError(
                    "real image resize requires PIL (pip install pillow), "
                    "not present in this environment; use decode='fake' for "
                    "the deterministic stub"
                )
            from PIL import Image

            self._Image = Image

    def _real_resize(self, batch: pa.Table) -> pa.Table:
        import io

        payloads, new_w, new_h = [], [], []
        for buf, mime in zip(
            batch["payload"].to_pylist(), batch["mime"].to_pylist()
        ):
            img = self._Image.open(io.BytesIO(buf))
            fmt = img.format or (mime.split("/")[-1].upper() if mime else "PNG")
            img.thumbnail((self.tw, self.th))  # aspect-preserving, no upscale
            out = io.BytesIO()
            img.save(out, format=fmt)
            payloads.append(out.getvalue())
            new_w.append(img.width)
            new_h.append(img.height)
        t = batch.set_column(
            batch.column_names.index("payload"), "payload",
            pa.array(payloads, pa.binary()),
        )
        t = t.set_column(
            t.column_names.index("width"), "width",
            pa.array(new_w, pa.int32()),
        )
        return t.set_column(
            t.column_names.index("height"), "height",
            pa.array(new_h, pa.int32()),
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.decode == "real":
            return self._real_resize(batch)
        w = np.asarray(batch["width"], np.float64)
        h = np.asarray(batch["height"], np.float64)
        scale = np.minimum(self.tw / np.maximum(w, 1), self.th / np.maximum(h, 1))
        scale = np.minimum(scale, 1.0)  # never upscale
        new_w = np.maximum((w * scale).astype(np.int32), 1)
        new_h = np.maximum((h * scale).astype(np.int32), 1)
        payload = batch["payload"]
        if isinstance(payload, pa.ChunkedArray):
            payload = payload.combine_chunks()
        # fake resize: keep a prefix of the bytes proportional to the
        # area ratio (deterministic; a real impl would re-encode)
        ratio = (new_w.astype(np.float64) * new_h) / np.maximum(w * h, 1)
        n = len(payload)
        offsets = np.frombuffer(
            payload.buffers()[1], np.int32, count=n + 1, offset=payload.offset * 4
        ).astype(np.int64)
        lengths = offsets[1:] - offsets[:-1]
        keep = np.maximum((lengths * ratio).astype(np.int64), 1)
        data = np.frombuffer(payload.buffers()[2], np.uint8)
        new_offsets = np.zeros(n + 1, np.int64)
        np.cumsum(keep, out=new_offsets[1:])
        out_buf = np.empty(int(new_offsets[-1]), np.uint8)
        # vectorized ranged copy (same gather pattern as pack_batch)
        rep = np.repeat(np.arange(n), keep)
        within = np.arange(len(out_buf)) - np.repeat(new_offsets[:-1], keep)
        out_buf[:] = data[offsets[:-1][rep] + within]
        new_payload = pa.BinaryArray.from_buffers(
            pa.binary(),
            n,
            [
                None,
                pa.py_buffer(new_offsets.astype(np.int32)),
                pa.py_buffer(out_buf),
            ],
        )  # zero-copy from the gathered buffer — no per-row Python
        t = batch.set_column(
            batch.column_names.index("payload"), "payload", new_payload
        )
        t = t.set_column(t.column_names.index("width"), "width", pa.array(new_w))
        return t.set_column(t.column_names.index("height"), "height", pa.array(new_h))


class FrameSampleStage:
    """Actor-pool stage: sample K frames per video at evenly spaced
    indices. flat_map-style: one output row PER SAMPLED FRAME
    (item_id, frame_idx, frame_bytes) — the layout a caption/embedding
    stage downstream consumes. Fixed frame stride makes the fake path
    fully deterministic; decode="real" raises at the libav call site."""

    def __init__(self, k: int = 4, frame_bytes: int = 256, decode: str = "fake"):
        self.k = k
        self.frame_bytes = frame_bytes
        self.decode = decode
        if decode == "real":
            import importlib.util

            if importlib.util.find_spec("av") is None:
                raise NotImplementedError(
                    "real frame extraction requires PyAV/libav (pip install "
                    "av), "
                    "not present in this environment; use decode='fake' for "
                    "the deterministic stub"
                )
            import av

            self._av = av

    def _real_frames(self, batch: pa.Table) -> pa.Table:
        import io

        item_ids, frame_idxs, frames = [], [], []
        for iid, buf in zip(
            batch["item_id"].to_pylist(), batch["payload"].to_pylist()
        ):
            with self._av.open(io.BytesIO(buf)) as container:
                stream = container.streams.video[0]
                total = stream.frames or 0
                want = {
                    (i * total) // self.k for i in range(self.k)
                } if total else set()
                for fi, frame in enumerate(container.decode(stream)):
                    if total and fi not in want:
                        continue
                    item_ids.append(iid)
                    frame_idxs.append(fi)
                    frames.append(
                        frame.to_ndarray(format="rgb24").tobytes()
                    )
        return pa.table(
            {
                "item_id": pa.array(item_ids, pa.int64()),
                "frame_idx": pa.array(frame_idxs, pa.int32()),
                "frame_bytes": pa.array(frames, pa.binary()),
            }
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.decode == "real":
            return self._real_frames(batch)
        payload = batch["payload"]
        if isinstance(payload, pa.ChunkedArray):
            payload = payload.combine_chunks()
        n_frames = np.asarray(batch["n_frames"], np.int64)
        item_ids = np.asarray(batch["item_id"], np.int64)
        k = np.minimum(self.k, n_frames)
        # evenly spaced frame indices per video, all-vectorized
        rep_item = np.repeat(item_ids, k)
        rep_nf = np.repeat(n_frames, k)
        rep_k = np.repeat(k, k)
        pos = np.arange(int(k.sum())) - np.repeat(
            np.concatenate([[0], np.cumsum(k)[:-1]]), k
        )
        frame_idx = (pos * rep_nf) // np.maximum(rep_k, 1)
        fb = self.frame_bytes
        n = len(payload)
        offsets = np.frombuffer(
            payload.buffers()[1], np.int32, count=n + 1, offset=payload.offset * 4
        ).astype(np.int64)
        data = np.frombuffer(payload.buffers()[2], np.uint8)
        row_of = np.repeat(np.arange(n), k)
        starts = offsets[:-1][row_of] + frame_idx * fb
        frames = [
            data[s : s + fb].tobytes() for s in starts
        ]  # per-frame slices (bounded: k x batch rows)
        return pa.table(
            {
                "item_id": pa.array(rep_item),
                "frame_idx": pa.array(frame_idx.astype(np.int32)),
                "frame_bytes": pa.array(frames, pa.binary()),
            }
        )


def media_resize(
    ds: Dataset, target: tuple[int, int] = (256, 256), decode: str = "fake",
    concurrency=(1, 4), batch_size: int = 256,
) -> Dataset:
    return ds.map_batches(
        MediaResizeStage,
        fn_constructor_kwargs={
            "target_w": target[0], "target_h": target[1], "decode": decode
        },
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        zero_copy_batch=True,
    )


def frame_sample(
    ds: Dataset, k: int = 4, frame_bytes: int = 256, decode: str = "fake",
    concurrency=(1, 4), batch_size: int = 128,
) -> Dataset:
    """Small batches: video rows are the widest payloads in the table
    (batch_size ~= budget_bytes / (n_frames x frame_bytes))."""
    return ds.map_batches(
        FrameSampleStage,
        fn_constructor_kwargs={
            "k": k, "frame_bytes": frame_bytes, "decode": decode
        },
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        zero_copy_batch=True,
    )


def media_table_from_documents(ds: Dataset) -> Dataset:
    """Deterministic media corpus DERIVED from the documents table
    (round 5): payload = the document's utf8 bytes (single space when
    empty — np.add.reduceat misreads zero-length segments, and the
    guard keeps the byte math SQL-replayable), metadata = pure integer
    functions of doc_id. Same schema as synthesize_media_table, but an
    independent DuckDB oracle can recompute every byte — which makes
    the mm_* driver rows hash-checkable instead of rows-only. The
    derivation is one vectorized Arrow pass (string->binary cast is
    zero-copy)."""
    import pyarrow.compute as pc

    def derive(t: pa.Table) -> pa.Table:
        doc_id = t["doc_id"]
        text = t["text"]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        empty = pc.equal(pc.binary_length(text), 0)
        payload = pc.if_else(empty, pa.scalar(" "), text).cast(pa.binary())
        did = doc_id
        if isinstance(did, pa.ChunkedArray):
            did = did.combine_chunks()
        mime = pc.if_else(
            pc.equal(pc.bit_wise_and(did, 1), 0),
            pa.scalar("image/png"),
            pa.scalar("image/jpeg"),
        )
        def _mod961(x):
            # pyarrow has no modulo kernel: x % 961 = x - 961*(x//961)
            q = pc.divide(x, pa.scalar(961, pa.int64()))
            return pc.subtract(x, pc.multiply(q, pa.scalar(961, pa.int64())))

        w37 = pc.multiply(doc_id, pa.scalar(37, pa.int64()))
        h61 = pc.multiply(doc_id, pa.scalar(61, pa.int64()))
        width = pc.add(pa.scalar(64, pa.int64()), _mod961(w37)).cast(pa.int32())
        height = pc.add(pa.scalar(64, pa.int64()), _mod961(h61)).cast(pa.int32())
        return pa.table(
            {
                "item_id": doc_id,
                "payload": payload,
                "mime": mime,
                "width": width,
                "height": height,
            }
        )

    return ds.map_batches(derive, batch_format="pyarrow")


def video_table_from_documents(ds: Dataset, frame_bytes: int = 256) -> Dataset:
    """Deterministic video corpus derived from documents: payload =
    utf8 bytes, n_frames = byte length // frame_bytes (docs shorter
    than one frame have zero frames and sample no rows). Same schema
    as synthesize_video_table; SQL-replayable like
    media_table_from_documents."""
    import pyarrow.compute as pc

    def derive(t: pa.Table) -> pa.Table:
        text = t["text"]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        payload = text.cast(pa.binary())
        nf = pc.divide(
            pc.binary_length(payload).cast(pa.int64()),
            pa.scalar(frame_bytes, pa.int64()),
        ).cast(pa.int32())
        return pa.table(
            {
                "item_id": t["doc_id"],
                "payload": payload,
                "mime": pa.array(["video/mp4"] * t.num_rows, pa.string()),
                "n_frames": nf,
                "fps": pa.array(
                    np.full(t.num_rows, 24.0, np.float32), pa.float32()
                ),
            }
        )

    return ds.map_batches(derive, batch_format="pyarrow")
