"""Property-based tests (hypothesis) for the pure-Python kernels — the
pieces whose correctness everything distributed leans on: the BMP codec,
the partitioned Bloom filter, and the WARC record round-trip.  No Spark
jobs here, so hypothesis can run many examples cheaply."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from mizzounewscrawler_spark.operators.dedup import (
    PartitionedBloom,
    _bloom_params,
    add_hashes,
)
from mizzounewscrawler_spark.operators.multimodal import (
    _decode_bmp,
    encode_bmp,
    resize_bmp,
)
from mizzounewscrawler_spark.sources.warc import encode_warc, parse_warc

# ---------------------------------------------------------------------------
# BMP codec
# ---------------------------------------------------------------------------

_dims = st.integers(min_value=1, max_value=40)


@settings(max_examples=60, deadline=None)
@given(w=_dims, h=_dims, data=st.data())
def test_bmp_roundtrip(w, h, data):
    px = bytes(
        data.draw(
            st.lists(
                st.integers(0, 255), min_size=w * h * 3, max_size=w * h * 3
            )
        )
    )
    d = _decode_bmp(encode_bmp(w, h, px))
    assert d["ok"] and (d["width"], d["height"]) == (w, h)
    assert d["body"] == px


@settings(max_examples=40, deadline=None)
@given(w=_dims, h=_dims, nw=_dims, nh=_dims, seed=st.integers(0, 2**31))
def test_bmp_resize_matches_nearest_neighbor(w, h, nw, nh, seed):
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    out = _decode_bmp(resize_bmp(encode_bmp(w, h, px.tobytes()), nw, nh))
    assert (out["width"], out["height"]) == (nw, nh)
    got = np.frombuffer(out["body"], dtype=np.uint8).reshape(nh, nw, 3)
    ys = (np.arange(nh) * h // nh).clip(0, h - 1)
    xs = (np.arange(nw) * w // nw).clip(0, w - 1)
    assert np.array_equal(got, px[ys][:, xs])


@settings(max_examples=60, deadline=None)
@given(junk=st.binary(max_size=200))
def test_bmp_decoder_never_crashes_on_garbage(junk):
    d = _decode_bmp(junk)
    assert isinstance(d, dict) and "ok" in d
    if d["ok"]:  # any accepted blob must be self-consistent
        assert len(d["body"]) == d["width"] * d["height"] * 3


# ---------------------------------------------------------------------------
# partitioned Bloom filter
# ---------------------------------------------------------------------------


@settings(max_examples=30, deadline=None)
@given(
    members=st.sets(st.integers(-(2**63), 2**63 - 1), min_size=1, max_size=300),
    shard_bits=st.integers(0, 4),
)
def test_bloom_no_false_negatives(members, shard_bits):
    m, k = _bloom_params(max(len(members), 16), 0.01)
    bloom = PartitionedBloom(shard_bits=shard_bits, m=m, k=k, shards={})
    arr = np.array(sorted(members), dtype=np.int64)
    bloom = add_hashes(bloom, arr)
    assert bool(bloom.contains(arr).all())


@settings(max_examples=15, deadline=None)
@given(seed=st.integers(0, 2**31))
def test_bloom_fpr_reasonable(seed):
    rng = np.random.default_rng(seed)
    members = rng.integers(-(2**62), 2**62, size=2000, dtype=np.int64)
    others = rng.integers(-(2**62), 2**62, size=2000, dtype=np.int64)
    others = np.setdiff1d(others, members)
    m, k = _bloom_params(len(members), 0.01)
    bloom = add_hashes(
        PartitionedBloom(shard_bits=2, m=m, k=k, shards={}), members
    )
    fp = float(bloom.contains(others).mean())
    assert fp < 0.05  # target 0.01 with generous slack


# ---------------------------------------------------------------------------
# WARC round-trip
# ---------------------------------------------------------------------------

_url = st.from_regex(r"https://[a-z]{1,10}\.example/[a-z0-9/]{0,20}", fullmatch=True)
_html = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=0x2FF), max_size=400
)


@settings(max_examples=40, deadline=None)
@given(
    recs=st.lists(
        st.fixed_dictionaries(
            {
                "url": _url,
                "warc_ts": st.just("2024-01-15T12:00:00Z"),
                "html": _html,
                "status": st.sampled_from([200, 301, 404, 500]),
            }
        ),
        max_size=8,
    )
)
def test_warc_roundtrip(recs):
    got = list(parse_warc(encode_warc(recs)))
    assert len(got) == len(recs)
    for r, g in zip(recs, got):
        assert g["url"] == r["url"]
        assert g["http_status"] == r["status"]
        assert g["html"] == r["html"].encode()
