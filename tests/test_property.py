"""Property-based tests (hypothesis) — round-trip and semantics
invariants promised in SURVEY.md §5."""

import json

import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from logpipe_ray.stages.transform import get_path, hash64_strings, make_filter
from logpipe_ray.tokenizer import detokenize, encode_lines

ascii_line = st.text(
    alphabet=st.characters(min_codepoint=0x20, max_codepoint=0x7E), max_size=300
)


@given(st.lists(ascii_line, max_size=50))
@settings(max_examples=200, deadline=None)
def test_tokenize_round_trip(lines):
    arr = encode_lines([l.encode() for l in lines])
    assert detokenize(arr).to_pylist() == lines


@given(st.lists(st.binary(max_size=200), min_size=1, max_size=30))
@settings(max_examples=100, deadline=None)
def test_tokenize_round_trip_arbitrary_bytes(blobs):
    # the byte<->token bijection holds for ANY bytes, not just ascii
    arr = encode_lines(blobs)
    toks = arr.to_pylist()
    assert all(all(3 <= t <= 258 for t in row) for row in toks)
    back = [bytes(t - 3 for t in row) for row in toks]
    assert back == blobs


@given(
    st.lists(
        st.fixed_dictionaries(
            {
                "k": st.sampled_from(["a", "b", "c"]),
                "v": st.integers(-1000, 1000),
            }
        ),
        min_size=1,
        max_size=100,
    )
)
@settings(max_examples=100, deadline=None)
def test_filter_equality_matches_python(rows):
    t = pa.Table.from_pylist(rows)
    out = make_filter({"k": "a"})(t)
    assert out.num_rows == sum(1 for r in rows if r["k"] == "a")
    anti = make_filter({"k": "a"}, include_matches=False)(t)
    assert anti.num_rows == len(rows) - out.num_rows


@given(st.lists(ascii_line, min_size=1, max_size=50))
@settings(max_examples=100, deadline=None)
def test_hash64_deterministic_and_batch_invariant(lines):
    arr = pa.array(lines, pa.string())
    h1 = hash64_strings(arr)
    h2 = hash64_strings(arr)
    assert (h1 == h2).all()
    # hashing a slice gives the same per-element values
    if len(lines) > 2:
        sub = pa.array(lines[1:], pa.string())
        hs = hash64_strings(sub)
        assert (h1[1:] == hs).all()


@given(
    st.lists(
        st.fixed_dictionaries(
            {"meta": st.fixed_dictionaries({"env": st.sampled_from(["d", "p"])})}
        ),
        min_size=1,
        max_size=30,
    )
)
@settings(max_examples=50, deadline=None)
def test_dot_path_struct_access(rows):
    t = pa.Table.from_pylist(rows)
    col = get_path(t, "meta.env")
    assert col.to_pylist() == [r["meta"]["env"] for r in rows]
    missing = get_path(t, "meta.nope.deep")
    assert missing.null_count == len(rows)
