import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from dedup_spark.config import MERSENNE_P61
from dedup_spark.functions.hashing import (
    content_digest,
    hash64_str,
    mulmod_p61,
    popcount64,
    to_signed64,
)


@given(
    st.lists(st.integers(0, MERSENNE_P61 - 1), min_size=1, max_size=50),
    st.lists(st.integers(0, MERSENNE_P61 - 1), min_size=1, max_size=50),
)
@settings(max_examples=200, deadline=None)
def test_mulmod_matches_bigint(xs, ys):
    n = min(len(xs), len(ys))
    a = np.array(xs[:n], dtype=np.uint64)
    x = np.array(ys[:n], dtype=np.uint64)
    got = mulmod_p61(a, x)
    exp = np.array([(i * j) % MERSENNE_P61 for i, j in zip(xs[:n], ys[:n])],
                   dtype=np.uint64)
    assert (got == exp).all()
    assert (got < MERSENNE_P61).all()


def test_mulmod_edges():
    p = MERSENNE_P61
    edge = np.array([0, 1, p - 1, p - 2, 2**32, 2**32 - 1], dtype=np.uint64)
    for ai in edge:
        got = mulmod_p61(np.full_like(edge, ai), edge)
        exp = np.array([(int(ai) * int(x)) % p for x in edge], dtype=np.uint64)
        assert (got == exp).all()


def test_hash64_deterministic_and_spread():
    vals = {hash64_str(f"w{i}") for i in range(1000)}
    assert len(vals) == 1000
    assert hash64_str("abc") == hash64_str("abc")


def test_popcount64():
    x = np.array([0, 1, 3, 2**63, 2**64 - 1], dtype=np.uint64)
    assert popcount64(x).tolist() == [0, 1, 2, 1, 64]


def test_to_signed_roundtrip():
    u = np.array([0, 2**63, 2**64 - 1], dtype=np.uint64)
    s = to_signed64(u)
    assert s.dtype == np.int64
    assert (s.view(np.uint64) == u).all()


def test_content_digest_sensitivity():
    assert content_digest(b"ab", "c") != content_digest(b"a", "bc")
    assert content_digest(b"x", "y") == content_digest(b"x", "y")
