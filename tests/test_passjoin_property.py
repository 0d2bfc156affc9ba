"""Property test of q_passjoin_dedup's candidate-generation guarantee.

A pure-Python mirror of the Spark/SQL partition+probe arithmetic
(operators/dedup.py _pass_layout / q_passjoin_dedup) is checked against
brute-force edit distance on adversarial small strings: every pair within
the threshold MUST be generated as a candidate (recall 1.0 — the pigeonhole
+ shift-window theorem), for any k. The Spark side is separately proven
value-exact against the brute-force DuckDB oracle; this test pins the
COMBINATORIAL claim at parameter corners the fixtures never hit."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st


def _layout(length: int, m: int) -> list[tuple[int, int]]:
    """[(start, seg_len)] — mirrors _pass_layout's integer arithmetic."""
    a, b = length // m, length % m
    return [
        (i * a + max(0, i - (m - b)), a + (1 if i >= m - b else 0))
        for i in range(m)
    ]


def _is_candidate(s: str, r: str, k: int) -> bool:
    """True iff the probe enumeration would generate (s, r): some segment
    of s (the shorter side) appears in r at a shift d inside BOTH the
    prefix/suffix edit budget |d| + |delta - d| <= k AND the multi-match-
    aware window d in [max(-i, delta-(k-i)), min(i, delta+(k-i))] — the
    exact filter q_passjoin_dedup ships."""
    if len(s) > len(r):
        s, r = r, s
    m = k + 1
    if len(s) < m:
        return False  # out of the operator's declared domain
    delta = len(r) - len(s)
    if delta > k:
        return False
    for i, (p, l) in enumerate(_layout(len(s), m)):
        seg = s[p : p + l]
        for d in range(-k, k + 1):
            if abs(d) + abs(delta - d) > k:
                continue
            if d < max(-i, delta - (k - i)) or d > min(i, delta + (k - i)):
                continue
            q = p + d
            if q < 0 or q + l > len(r):
                continue
            if r[q : q + l] == seg:
                return True
    return False


def _edit_distance(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


@settings(max_examples=300, deadline=None)
@given(
    s=st.text(alphabet="ab", min_size=4, max_size=24),
    r=st.text(alphabet="ab", min_size=4, max_size=24),
    k=st.integers(min_value=1, max_value=5),
)
def test_every_pair_within_threshold_is_a_candidate(s, r, k):
    if min(len(s), len(r)) < k + 1:
        return
    if _edit_distance(s, r) <= k:
        assert _is_candidate(s, r, k), (s, r, k)


@settings(max_examples=200, deadline=None)
@given(
    s=st.text(alphabet="abc", min_size=13, max_size=40),
    edits=st.lists(
        st.tuples(st.integers(0, 39), st.sampled_from("abc_")), max_size=12
    ),
)
def test_mutated_strings_stay_candidates_at_k12(s, edits):
    """The operator's actual k: apply <= 12 random edits and require
    candidacy whenever the resulting true distance stays <= 12."""
    r = list(s)
    for pos, ch in edits:
        if not r:
            break
        p = pos % len(r)
        if ch == "_":
            del r[p]  # deletion
        else:
            r[p] = ch  # substitution
    r = "".join(r)
    if min(len(s), len(r)) < 13:
        return
    if _edit_distance(s, r) <= 12:
        assert _is_candidate(s, r, 12), (s, r)
