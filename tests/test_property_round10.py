"""Property tests for the round-10 operators: random inputs against
independent brute-force Python models (no Spark-side logic reused)."""

from __future__ import annotations

import hashlib

import pytest
from hypothesis import given, settings, strategies as st

from hbase_gis_spark.operators.drift import count_min_audit, mann_whitney_auc


@settings(max_examples=5, deadline=None)
@given(
    data=st.lists(
        st.tuples(
            st.one_of(st.none(), st.integers(min_value=-4, max_value=4)),
            st.one_of(st.none(), st.integers(min_value=0, max_value=1)),
        ),
        min_size=0,
        max_size=30,
    ),
)
def test_mann_whitney_auc_matches_pair_count(spark, data):
    """u_x2 equals the brute-force 2·wins + ties pair count and
    auc_micro its truncated scaled ratio, under random scores, random
    labels, and NULLs on either side."""
    rows = [("k", s, y) for s, y in data] or [("pad", 0, 0)]
    df = spark.createDataFrame(rows, "k string, score int, label int")
    got = {
        r.k: r for r in mann_whitney_auc(df, "k", "score", "label").collect()
    }
    clean = [(s, y) for s, y in data if s is not None and y is not None]
    if not clean:
        assert "k" not in got
        return
    pos = [s for s, y in clean if y != 0]
    neg = [s for s, y in clean if y == 0]
    r = got["k"]
    assert (r.n_pos, r.n_neg) == (len(pos), len(neg))
    u2 = sum(
        2 if p > n else (1 if p == n else 0) for p in pos for n in neg
    )
    assert r.u_x2 == u2
    if pos and neg:
        assert r.auc_micro == (1_000_000 * u2) // (2 * len(pos) * len(neg))
    else:
        assert r.auc_micro is None


@settings(max_examples=5, deadline=None)
@given(
    keys=st.lists(
        st.text(
            alphabet="abcdefgh", min_size=1, max_size=4
        ),
        min_size=1,
        max_size=40,
    ),
    width=st.sampled_from([1, 2, 7, 64]),
    depth=st.sampled_from([1, 2, 3]),
)
def test_count_min_matches_md5_replay(spark, keys, width, depth):
    """cms_estimate equals an independent Python md5 count-min replay
    for every key, and the one-sided guarantee estimate >= exact
    holds at every (depth, width)."""
    df = spark.createDataFrame([(k,) for k in keys], "term string")
    out = count_min_audit(
        df, "term", top_n=100, depth=depth, width=width
    ).collect()

    from collections import Counter

    exact = Counter(keys)

    def bucket(i, k):
        return int(
            hashlib.md5(f"cms:{i}:{k}".encode()).hexdigest()[:15], 16
        ) % width

    grids = [Counter() for _ in range(depth)]
    for k, c in exact.items():
        for i in range(depth):
            grids[i][bucket(i, k)] += c
    assert len(out) == len(exact)
    for r in out:
        est = min(grids[i][bucket(i, r.term)] for i in range(depth))
        assert r.exact == exact[r.term]
        assert r.cms_estimate == est >= r.exact
        assert r.overestimate == est - r.exact


_B32 = "0123456789bcdefghjkmnpqrstuvwxyz"


@settings(max_examples=30, deadline=None)
@given(
    klon=st.integers(min_value=0, max_value=1 << 20),
    klat=st.integers(min_value=0, max_value=1 << 20),
    p=st.integers(min_value=1, max_value=8),
)
def test_cell_pyramid_bins_match_geohash_prefix(klon, klat, p):
    """The bit-interleave identity cell_pyramid rests on, pinned
    against the repo's ACTUAL base32 encoder: the formula bins equal
    the lon/lat bit groups deinterleaved from the point's precision-p
    geohash — including the clamped +90/+180 closed-top edges.
    Coordinates come from a 2^20 grid whose values are EXACT through
    both code paths (the subdivision encoder and the multiply-floor
    formula), so the identity is tested, not float noise."""
    import math

    from hbase_gis_spark.geo.geohash import encode

    lon = klon * 360.0 / (1 << 20) - 180.0
    lat = klat * 180.0 / (1 << 20) - 90.0
    nlon, nlat = (5 * p + 1) // 2, (5 * p) // 2
    lb = min(
        math.floor((lon + 180.0) / 360.0 * float(1 << nlon)),
        (1 << nlon) - 1,
    )
    tb = min(
        math.floor((lat + 90.0) / 180.0 * float(1 << nlat)),
        (1 << nlat) - 1,
    )
    bits = "".join(f"{_B32.index(c):05b}" for c in encode(lat, lon, p))
    lon_bits = int(bits[0::2], 2)  # geohash starts with a lon bit
    lat_bits = int(bits[1::2], 2) if p > 0 and bits[1::2] else 0
    assert (lb, tb) == (lon_bits, lat_bits)


@pytest.mark.filterwarnings(
    # the tie-mass skew RuntimeWarning is the operator WORKING as
    # documented on hypothesis-generated all-equal keys — asserted on
    # purpose-built inputs elsewhere; here it is seed-dependent noise
    "ignore:range_sharded tie-mass skew:RuntimeWarning"
)
@settings(max_examples=5, deadline=None)
@given(
    texts=st.lists(
        st.text(alphabet="ab ", min_size=0, max_size=12),
        min_size=2,
        max_size=15,
    ),
    window=st.sampled_from([2, 3, 5]),
)
def test_snm_string_key_order_parity(spark, texts, window):
    """The string-keyed SNM candidate set equals a Python replay that
    sorts by (key, id) — the byte-prefix surrogate + native tiebreak
    reproduces the exact string total order on arbitrary inputs
    (including empty strings and shared prefixes)."""
    from hbase_gis_spark.operators.dedup import sorted_neighborhood_pairs

    rows = [(i, "alpha beta gamma delta", t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string, k string")
    got = {
        (r.id_a, r.id_b)
        for r in sorted_neighborhood_pairs(
            df, sort_col="k", window=window, threshold=0.9
        ).collect()
    }
    order = sorted(rows, key=lambda r: (r[2], r[0]))
    expect = set()
    for i, a in enumerate(order):
        for b in order[i + 1 : i + window]:
            expect.add(tuple(sorted((a[0], b[0]))))
    # identical texts => every candidate verifies at jaccard 1.0
    assert got == expect
