import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from dedup_spark.functions.suffix import containment_pairs, suffix_array

texts = st.text(alphabet="ab c", min_size=0, max_size=60)


@given(st.binary(min_size=1, max_size=200))
@settings(max_examples=150, deadline=None)
def test_suffix_array_matches_bruteforce(data):
    sa = suffix_array(data)
    exp = sorted(range(len(data)), key=lambda i: data[i:])
    assert sa.tolist() == exp


@given(st.lists(texts, min_size=2, max_size=8))
@settings(max_examples=100, deadline=None)
def test_containment_matches_bruteforce(docs):
    ids = [f"d{i:02d}" for i in range(len(docs))]
    got = containment_pairs(ids, docs, min_len=3)
    exp = set()
    for i in range(len(docs)):
        for j in range(len(docs)):
            if i != j and len(docs[i]) >= 3 and docs[i] in docs[j]:
                a, b = sorted((ids[i], ids[j]))
                exp.add((a, b))
    assert got == exp


def test_containment_min_len_gate():
    got = containment_pairs(["a", "b"], ["short", "short and longer"], min_len=12)
    assert got == set()
    got = containment_pairs(
        ["a", "b"], ["twelve chars!", "xx twelve chars! yy"], min_len=12
    )
    assert got == {("a", "b")}


def test_suffix_array_empty():
    assert suffix_array(b"").tolist() == []
    assert len(suffix_array(bytes(np.zeros(5, dtype=np.uint8)))) == 5
