"""Property-based fuzzing for the round-9 codec layer: arbitrary
payloads through independent compressors must round-trip through the
in-repo decoders, and the in-repo encoder/decoder pairs must agree on
arbitrary inputs. Complements the golden-vector tests with breadth."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

pa = pytest.importorskip("pyarrow")

_FUZZ = settings(
    max_examples=40,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


@_FUZZ
@given(st.binary(min_size=0, max_size=5000), st.sampled_from([1, 3, 9]))
def test_zstd_decodes_anything_libzstd_emits(payload, level):
    from pwc_challenge_dataengineer_spark.sources.zstd_lite import decompress

    z = pa.Codec("zstd", compression_level=level).compress(payload)
    assert decompress(z.to_pybytes()) == payload


@_FUZZ
@given(st.lists(st.integers(0, 7), min_size=1, max_size=3000))
def test_gif_lzw_round_trips_any_index_stream(indices):
    from pwc_challenge_dataengineer_spark.functions.gif_codec import (
        lzw_decode,
        lzw_encode,
    )

    assert lzw_decode(lzw_encode(indices, 3), 3, len(indices)) == indices


@_FUZZ
@given(st.binary(min_size=0, max_size=3000))
def test_packbits_round_trips_any_bytes(payload):
    from pwc_challenge_dataengineer_spark.functions.tiff_codec import (
        packbits_decode,
        packbits_encode,
    )

    assert packbits_decode(packbits_encode(payload), len(payload)) == payload


@_FUZZ
@given(st.binary(min_size=0, max_size=4000))
def test_lz4_block_decodes_anything_liblz4_emits(payload):
    from pwc_challenge_dataengineer_spark.sources.orc_meta import (
        _lz4_block_decompress,
    )

    # pyarrow's "lz4_raw" codec is the block format ORC embeds
    try:
        codec = pa.Codec("lz4_raw")
    except Exception:
        pytest.skip("no lz4_raw codec in this pyarrow")
    z = codec.compress(payload).to_pybytes()
    assert _lz4_block_decompress(z) == payload


@_FUZZ
@given(st.binary(min_size=0, max_size=2000))
def test_snappy_decodes_anything_libsnappy_emits(payload):
    from pwc_challenge_dataengineer_spark.sources.avrolite import (
        _snappy_decompress,
    )

    z = pa.Codec("snappy").compress(payload).to_pybytes()
    assert _snappy_decompress(z) == payload
