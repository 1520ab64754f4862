"""Property-based (hypothesis) tests for the pure numeric kernels whose
float-boundary reasoning carries the exactness claims: band counting,
candidate-window offsets, HLL rho, and the discrete-quantile rank."""

import math

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

finite = st.floats(
    allow_nan=False, allow_infinity=False, min_value=-1e6, max_value=1e6
)


@given(st.lists(st.integers(min_value=0, max_value=5), max_size=30))
def test_ranges_offsets_property(widths):
    from osm2geojson_ray.stages.events import _ranges_offsets

    w = np.asarray(widths, np.int64)
    got = _ranges_offsets(w)
    want = np.concatenate([np.arange(x, dtype=np.int64) for x in w]) if len(w) else np.zeros(0, np.int64)
    assert got.tolist() == want.tolist()


@settings(max_examples=200, deadline=None)
@given(
    st.lists(finite, min_size=1, max_size=40),
    st.lists(finite, max_size=60),
    st.floats(min_value=1e-9, max_value=100.0, allow_nan=False),
)
def test_band_count_matches_bruteforce(lvs, rvs, delta):
    """The searchsorted-bounds + guard-window count equals the exact
    float predicate count for arbitrary values and deltas."""
    from osm2geojson_ray.stages.events import band_count_sorted

    lv = np.asarray(lvs, np.float64)
    rv_s = np.sort(np.asarray(rvs, np.float64))
    got = band_count_sorted(lv, rv_s, float(delta))
    want = (np.abs(lv[:, None] - rv_s[None, :]) <= delta).sum(axis=1) if len(rv_s) else np.zeros(len(lv), np.int64)
    assert got.tolist() == want.tolist()


@given(st.integers(min_value=0, max_value=(1 << 54) - 1))
def test_hll_rho_matches_bit_length(w):
    from osm2geojson_ray.stages.sketch import _MAX_RHO, _rho

    got = int(_rho(np.asarray([w], np.int64))[0])
    want = _MAX_RHO if w == 0 else (w & -w).bit_length()
    assert got == want


# deadline=None: each example opens a DuckDB connection — IO-bound, and
# the default 200 ms deadline flakes under full-suite box load
@settings(max_examples=100, deadline=None)
@given(
    st.lists(finite, min_size=1, max_size=200),
    st.sampled_from([0.25, 0.5, 0.75, 0.9, 0.99]),
)
def test_disc_quantile_rank_semantics(vals, q):
    """ceil(q*n) 1-indexed rank — the exact element DuckDB quantile_disc
    returns (verified against DuckDB directly)."""
    import duckdb

    v = np.asarray(vals, np.float64)
    s = np.sort(v)
    rank = int(math.ceil(q * len(s)))
    ours = s[rank - 1]
    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT * FROM (SELECT unnest(?) AS x)", [v.tolist()])
    want = con.execute(f"SELECT quantile_disc(x, {q}) FROM t").fetchone()[0]
    con.close()
    assert ours == want


@settings(max_examples=100, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=1 << 40), min_size=1, max_size=50),
    st.lists(st.integers(min_value=1, max_value=97), min_size=1, max_size=5),
)
def test_hash_split_bucket_assignment(keys, weights):
    """Vectorized bucket→label assignment == per-row md5 reference for
    arbitrary positive weights (stages/sampling.hash_split kernel)."""
    import hashlib

    from osm2geojson_ray.stages.sampling import _bucket

    names = [f"s{i}" for i in range(len(weights))]
    bounds = np.cumsum(weights)
    total = int(bounds[-1])
    karr = np.asarray(keys, np.int64)
    b = _bucket(karr, "seed-x", total)
    got = np.asarray(names, dtype=object)[np.searchsorted(bounds, b, side="right")]
    for k, lab in zip(keys, got):
        h = int(hashlib.md5(f"seed-x:{k}".encode()).hexdigest()[:15], 16) % total
        j = 0
        while h >= bounds[j]:
            j += 1
        assert lab == names[j]
