import pyarrow as pa

from logpipe_ray.tokenizer import detokenize, encode_lines
from logpipe_ray import TOKEN_OFFSET


def test_round_trip_basic():
    lines = [b'{"a":1}', b"", b"hello world", b"x" * 500]
    arr = encode_lines(lines)
    out = detokenize(arr).to_pylist()
    assert out == [l.decode() for l in lines]


def test_token_offset_reserved():
    arr = encode_lines([bytes(range(256))])
    toks = arr.flatten().to_pylist()
    assert min(toks) == TOKEN_OFFSET
    assert max(toks) == 255 + TOKEN_OFFSET


def test_detokenize_sliced_and_chunked():
    lines = [f"line-{i}".encode() for i in range(10)]
    arr = encode_lines(lines)
    sl = arr.slice(3, 4)
    assert detokenize(sl).to_pylist() == [f"line-{i}" for i in range(3, 7)]
    ch = pa.chunked_array([arr.slice(0, 5), arr.slice(5, 5)])
    assert detokenize(ch).to_pylist() == [f"line-{i}" for i in range(10)]


def test_encode_is_int32_list():
    arr = encode_lines([b"abc"])
    assert arr.type == pa.list_(pa.int32())
