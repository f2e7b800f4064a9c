"""Byte-level tokenizer: log line (utf-8/ascii) <-> list<int32> tokens.

token = byte + TOKEN_OFFSET (3); ids 0/1/2 are reserved (PAD/BOS/EOS)
and never appear in encoded data. The mapping is a bijection, so
detokenize(encode(line)) == line bit-exactly — the basis of the
per-row token-array-equality invariant (SURVEY.md §7.4).

Both directions are vectorized over whole Arrow arrays (no per-row
Python in the hot path): encoding builds one flat byte buffer +
offsets; decoding reuses the list offsets to build a StringArray
directly from buffers.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from . import TOKEN_OFFSET


def encode_lines(lines: list[bytes]) -> pa.ListArray:
    """Encode a list of byte strings into a list<int32> token array."""
    lengths = np.fromiter((len(b) for b in lines), dtype=np.int64, count=len(lines))
    offsets = np.zeros(len(lines) + 1, dtype=np.int32)
    np.cumsum(lengths, out=offsets[1:])
    flat = np.frombuffer(b"".join(lines), dtype=np.uint8).astype(np.int32)
    flat += TOKEN_OFFSET
    return pa.ListArray.from_arrays(pa.array(offsets, type=pa.int32()),
                                    pa.array(flat, type=pa.int32()))


def encode_array(text: pa.Array | pa.ChunkedArray) -> pa.ListArray:
    """Vectorized encode of a whole Arrow string column: reuse the
    StringArray's own offsets/value buffers (one numpy add over the
    flat byte buffer, no per-row Python). Equivalent to
    ``encode_lines([s.encode() for s in text])`` — tested byte-equal."""
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    raw = np.frombuffer(text.buffers()[1], dtype=np.int32)
    off = raw[text.offset : text.offset + len(text) + 1]
    data = np.frombuffer(text.buffers()[2], dtype=np.uint8)[
        off[0] : off[-1]
    ].astype(np.int32)
    data += TOKEN_OFFSET
    return pa.ListArray.from_arrays(
        pa.array((off - off[0]).astype(np.int32), pa.int32()),
        pa.array(data, pa.int32()),
    )


def _as_list_array(tokens: pa.Array | pa.ChunkedArray) -> pa.ListArray:
    if isinstance(tokens, pa.ChunkedArray):
        tokens = tokens.combine_chunks()
    return tokens


def detokenize(tokens: pa.Array | pa.ChunkedArray) -> pa.StringArray:
    """Decode a list<int32> token column back to the original lines.

    Vectorized: flatten -> subtract offset -> reinterpret the byte
    buffer as utf-8 string data with the recomputed offsets.
    """
    arr = _as_list_array(tokens)
    flat = arr.flatten()  # respects slices; values in logical order
    lengths = np.asarray(
        pa.compute.list_value_length(arr).fill_null(0), dtype=np.int64
    )
    offsets = np.zeros(len(arr) + 1, dtype=np.int32)
    np.cumsum(lengths, out=offsets[1:])
    data = (np.asarray(flat, dtype=np.int32) - TOKEN_OFFSET).astype(np.uint8)
    return pa.Array.from_buffers(
        pa.utf8(),
        len(arr),
        [None, pa.py_buffer(offsets.tobytes()), pa.py_buffer(data.tobytes())],
    )


def detokenize_to_pylist(tokens: pa.Array | pa.ChunkedArray) -> list[str]:
    return detokenize(tokens).to_pylist()
