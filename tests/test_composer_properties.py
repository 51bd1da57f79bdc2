"""Property-based tests for the key-range composer: for random predicate
sets over a small key universe, the composed ranges must select EXACTLY the
keys the predicates select (soundness + completeness of pruning against a
brute-force evaluator).  Pure Python — no JVM."""

from __future__ import annotations

from itertools import product

from hypothesis import given, settings, strategies as st

from datafusion_bigtable_spark.plans.composer import (
    Between,
    ComposerError,
    Eq,
    In,
    compose,
)

COLS = ("a", "b", "c")
SEP = "#"
VALUES = ["0", "1", "2", "x"]
UNIVERSE = [SEP.join(t) for t in product(VALUES, repeat=3)]


def eval_predicates(key: str, preds) -> bool:
    """Brute-force: does this key satisfy every predicate the composer
    honors?  (Eq/In conjunction per column; Between on the tail.)"""
    parts = key.split(SEP)
    comp = dict(zip(COLS, parts))
    for p in preds:
        if isinstance(p, Eq):
            if comp.get(p.col) != p.value:
                return False
        elif isinstance(p, In):
            if not p.negated and comp.get(p.col) not in p.values:
                return False
        elif isinstance(p, Between):
            if p.col == COLS[-1] and not p.negated:
                if not (p.low <= comp[p.col] <= p.high):
                    return False
    return True


def in_ranges(key: str, ranges) -> bool:
    return any(r.start <= key <= r.end for r in ranges)


vals = st.sampled_from(VALUES)
eq_strategy = st.builds(Eq, st.sampled_from(COLS), vals)
in_strategy = st.builds(
    In, st.sampled_from(COLS), st.lists(vals, min_size=1, max_size=3).map(tuple)
)
between_strategy = st.builds(
    lambda lo, hi: Between("c", min(lo, hi), max(lo, hi)), vals, vals
)
preds_strategy = st.lists(
    st.one_of(eq_strategy, in_strategy, between_strategy), min_size=0, max_size=6
)


@settings(max_examples=300, deadline=None)
@given(preds_strategy)
def test_ranges_select_exactly_the_predicate_keys(preds):
    """Soundness+completeness when the composer accepts the predicate set.

    Caveat encoded deliberately: predicates are conjunctive, and the
    composer unions a tail BETWEEN with tail Eq/In values (deviation 2) —
    mirror that in the expected set by treating tail value-lists and the
    tail range as alternatives.
    """
    try:
        ranges = compose(preds, COLS, SEP)
    except ComposerError:
        return  # rejected sets are covered by unit tests

    # Build expected key set: conjunction over leading cols; tail = union
    # of (in tail values) and (in tail range) if both present.
    tail_vals = [v for p in preds if isinstance(p, (Eq, In)) and p.col == "c"
                 for v in ((p.value,) if isinstance(p, Eq) else (() if p.negated else p.values))]
    tail_rng = None
    for p in preds:
        if isinstance(p, Between) and p.col == "c" and not p.negated:
            tail_rng = (p.low, p.high)

    # Per-column value collectors UNION (reference composer.rs:176-183
    # appends every Eq/IN literal to one list — contradictory Eqs act like
    # IN; safe because pruning is Inexact and Spark re-filters above).
    col_vals: dict[str, set] = {}
    for p in preds:
        if isinstance(p, Eq):
            col_vals.setdefault(p.col, set()).add(p.value)
        elif isinstance(p, In) and not p.negated:
            col_vals.setdefault(p.col, set()).update(p.values)

    def expected(key: str) -> bool:
        parts = dict(zip(COLS, key.split(SEP)))
        for col in ("a", "b"):
            if col in col_vals and parts[col] not in col_vals[col]:
                return False
        c = parts["c"]
        ok_tail = False
        if tail_vals and c in tail_vals:
            ok_tail = True
        if tail_rng and tail_rng[0] <= c <= tail_rng[1]:
            ok_tail = True
        return ok_tail

    for key in UNIVERSE:
        assert in_ranges(key, ranges) == expected(key), (key, preds, ranges)


@settings(max_examples=200, deadline=None)
@given(preds_strategy)
def test_pruning_is_sound_for_conjunctive_semantics(preds):
    """Weaker invariant that must hold regardless of deviations: every key
    satisfying ALL honored predicates conjunctively lies inside some range
    (pruning may over-select — Inexact — but must never under-select keys
    that match every predicate)."""
    try:
        ranges = compose(preds, COLS, SEP)
    except ComposerError:
        return
    has_tail_value = any(isinstance(p, (Eq, In)) and p.col == "c" and (not getattr(p, "negated", False)) for p in preds)
    for key in UNIVERSE:
        if eval_predicates(key, preds):
            # under conjunctive semantics a tail BETWEEN and tail values
            # both constrain; compose() unions them, a superset — so the
            # conjunctive match set must be inside the ranges
            if has_tail_value or any(isinstance(p, Between) and p.col == "c" for p in preds):
                assert in_ranges(key, ranges), (key, preds, ranges)
