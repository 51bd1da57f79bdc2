"""Property test for prefix filtering's exactness theorem: for random
small corpora and thresholds, prefix_filter_pairs must equal the
all-pairs exact Jaccard join — the zero-false-negative guarantee is a
THEOREM (shared prefix under a global order), so any counterexample is
an implementation bug, not sampling noise.

The truth side is a pure-Python brute force over the SAME shingle
definition (lowercase word 3-grams, distinct), so a bug shared by
jaccard_pairs and prefix_filter_pairs cannot hide.  Spark round-trips
are expensive — examples are capped and the corpus universe is small.
"""

from __future__ import annotations

import re
from itertools import combinations

from hypothesis import HealthCheck, given, settings, strategies as st

WORDS = ["alpha", "beta", "gamma", "delta", "eps"]


def _shingles(text: str, k: int = 3) -> set[str]:
    ws = [w for w in re.split(r"[^a-z0-9]+", text.lower()) if w]
    return {" ".join(ws[i : i + k]) for i in range(len(ws) - k + 1)}


def _truth(rows, t):
    sh = {i: _shingles(x) for i, x in rows}
    out = {}
    for (a, sa), (b, sb) in combinations(sorted(sh.items()), 2):
        if not sa or not sb:
            continue
        j = len(sa & sb) / len(sa | sb)
        if round(j, 4) >= t:
            out[(a, b)] = round(j, 4)
    return out


docs_strategy = st.lists(
    st.lists(st.sampled_from(WORDS), min_size=0, max_size=8).map(" ".join),
    min_size=2,
    max_size=7,
)


@settings(max_examples=12, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(texts=docs_strategy, t=st.sampled_from([0.3, 0.5, 0.8, 1.0]))
def test_prefix_filter_matches_bruteforce(spark, texts, t):
    from datafusion_bigtable_spark.operators.dedup import prefix_filter_pairs

    rows = list(enumerate(texts))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r.id_a, r.id_b): r.jaccard for r in prefix_filter_pairs(df, k=3, threshold=t).collect()}
    want = _truth(rows, t)
    assert got == want, f"t={t} texts={texts}: got {got}, want {want}"
