"""Hypothesis property sweeps for the round-10 algorithm cores, run
against pure-Python twins (no Spark session — the adaptive-gate
frontier-sweep pattern): the properties hold for EVERY generated
shape, not just the fixture."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st


# --- largest-remainder apportionment (doc_quota_alloc's core) ---------------


def _apportion(counts: dict[str, int], budget: int) -> dict[str, int]:
    """Pure-Python twin of doc_quota_alloc's integer arithmetic."""
    n_total = sum(counts.values())
    base = {s: (budget * n) // n_total for s, n in counts.items()}
    rem = {s: (budget * n) % n_total for s, n in counts.items()}
    leftover = budget - sum(base.values())
    order = sorted(counts, key=lambda s: (-rem[s], s))
    return {s: base[s] + (1 if order.index(s) < leftover else 0) for s in counts}


@settings(max_examples=300, deadline=None)
@given(
    st.dictionaries(
        st.text(alphabet="abcdefgh", min_size=1, max_size=3),
        st.integers(min_value=1, max_value=10_000),
        min_size=1,
        max_size=12,
    )
)
def test_apportionment_properties(counts):
    n_total = sum(counts.values())
    budget = (n_total * 3) // 5
    q = _apportion(counts, budget)
    # exact total
    assert sum(q.values()) == budget
    # quota within [floor, floor+1] of the exact proportional share
    for s, n in counts.items():
        lo = (budget * n) // n_total
        assert q[s] in (lo, lo + 1)
        # never exceeds the source size when budget <= total
        assert q[s] <= n


# --- linear multi-touch credit split (ev_attribution_credit's core) ---------


@settings(max_examples=300, deadline=None)
@given(st.integers(min_value=1, max_value=500))
def test_credit_split_conserves_exactly(n_touches):
    base = 10_000 // n_touches
    rem = 10_000 % n_touches
    credits = [base + (1 if rank <= rem else 0) for rank in range(1, n_touches + 1)]
    assert sum(credits) == 10_000
    # monotone: earlier touches never earn less than later ones
    assert all(credits[i] >= credits[i + 1] for i in range(len(credits) - 1))
    # spread at most one bp
    assert max(credits) - min(credits) <= 1


# --- winnowing selection guarantees (doc_winnow_fingerprints' core) ---------


def _winnow(hashes: list[int], w: int = 4) -> set[tuple[int, int]]:
    """Pure-Python winnowing twin: min (hash, pos) per window."""
    out = set()
    for i in range(len(hashes) - w + 1):
        window = [(hashes[i + k], i + k) for k in range(w)]
        out.add(min(window))
    return out


@settings(max_examples=300, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**52), min_size=4, max_size=120))
def test_winnowing_gap_and_density_bounds(hashes):
    w = 4
    sel = sorted(p for _h, p in _winnow(hashes, w))
    # coverage: every window contributes a selection inside itself
    assert sel, "at least one selection for >= w hashes"
    # gap bound: consecutive selected positions differ by <= w (a gap
    # of more than w would leave some window without a selection)
    assert all(b - a <= w for a, b in zip(sel, sel[1:]))
    # boundary: first selection within the first window, last within
    # the last
    assert sel[0] <= w - 1
    assert sel[-1] >= len(hashes) - w


@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=2**52), min_size=10, max_size=60),
    st.integers(min_value=0, max_value=30),
    st.integers(min_value=0, max_value=30),
)
def test_winnowing_shared_run_guarantee(shared, pre_n, post_n):
    """Two sequences sharing a run of >= 2w-1 hashes select at least
    one common (hash) fingerprint, wherever the run is embedded.
    (2w-1 guarantees a FULL window of the shared run whose
    neighborhood is also shared — the Schleimer et al. bound is
    w + k - 1 in TOKENS for k-gram hashes; in hash positions a
    common full window suffices, and any run >= 2w-1 contains a
    window whose minimum is interior to the run in both documents.)"""
    w = 4
    if len(shared) < 2 * w - 1:
        return
    import random

    rnd = random.Random(42)
    pre = [rnd.randint(0, 2**52) for _ in range(pre_n)]
    post = [rnd.randint(0, 2**52) for _ in range(post_n)]
    a = pre + shared + post
    b = shared + post  # different offset embedding
    ha = {h for h, _p in _winnow(a, w)}
    hb = {h for h, _p in _winnow(b, w)}
    assert ha & hb, "shared run must share a selected hash"


# --- dyadic EWMA kernel (grid_ewma_dyadic's core) ----------------------------


def test_ewma_kernel_is_exact_and_normalized():
    from decimal import Decimal

    from netcdf_olap_spark.queries.grid import EWMA_TAPS

    taps = [Decimal(t) for t in EWMA_TAPS]
    assert sum(taps) == 1
    # strictly dyadic: every tap is k/2^7
    assert all((t * 128) == int(t * 128) for t in taps)
    # monotone non-increasing kernel
    assert all(a >= b for a, b in zip(taps, taps[1:]))
