"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are carried as Arrow `binary` columns with typed
metadata columns (mime, width/height or sample_rate, n_frames). The
Ray-side plumbing — schema, small batch sizes for wide rows, actor-pool
stages with per-actor decoder state, output layout — is real and
tested; the actual byte decoding is STUBBED (no image/audio libraries
in this environment): `decode="fake"` computes deterministic features
from the payload bytes, `decode="real"` raises NotImplementedError at
the exact call site where PIL/libav would be invoked.

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
            # A real deployment would load codecs/models here, e.g.:
            #   from PIL import Image  # not available in this env
            pass

    def __call__(self, batch: pa.Table) -> pa.Table:
        payload = batch["payload"]
        if isinstance(payload, pa.ChunkedArray):
            payload = payload.combine_chunks()
        if self.decode == "real":
            raise NotImplementedError(
                "real media decoding requires PIL/libav, not present in this "
                "environment; use decode='fake' for the deterministic stub"
            )
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
