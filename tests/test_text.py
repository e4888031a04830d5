import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from dedup_spark.functions.text import norm_col, normalize_caption, word_shingles


def test_normalize_pinned():
    assert normalize_caption("  Hello,   WORLD! a b c  ") == "hello world a b c"
    assert normalize_caption("") == ""
    assert normalize_caption("!!!") == ""


def test_shingles_short_caption_fallback():
    assert word_shingles("a b", 3) == ["a b"]
    assert word_shingles("", 3) == []
    assert word_shingles("a b c d", 3) == ["a b c", "b c d"]


def test_shingles_distinct():
    sh = word_shingles("x y x y x y x y", 3)
    assert len(sh) == len(set(sh)) == 2


@given(st.lists(st.text(alphabet="aB c,.!3", min_size=0, max_size=12), max_size=40))
@settings(max_examples=20, deadline=None)
def test_norm_col_matches_python(spark, caps):
    caps = [c for c in caps] + ["  MiXed   CASE, punct!  ", ""]
    df = spark.createDataFrame(pd.DataFrame({"caption": caps}))
    got = [r[0] for r in df.select(norm_col(df.caption)).collect()]
    exp = [normalize_caption(c) for c in caps]
    assert got == exp
