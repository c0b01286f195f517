"""Property test: the Spark matcher and the pandas oracle implement the
same greedy longest-match semantics on adversarial random texts
(overlapping surfaces, near-miss prefixes, odd whitespace, case)."""


from hypothesis import given, settings
from hypothesis import strategies as st

from kgflow.operators.extract import build_matcher, find_mentions
from kgflow.reference_oracle import _scan

SURFACES = [
    "alpha kinase",
    "alpha kinase beta",
    "beta",
    "beta receptor",
    "gamma",
    "alpha",  # single-token surface that prefixes the two-token ones
]
VOCAB = ["alpha", "kinase", "beta", "receptor", "gamma", "the", "x", "Y"]


@settings(max_examples=300, deadline=None)
@given(
    st.lists(st.sampled_from(VOCAB), min_size=0, max_size=30),
    st.sampled_from([" ", "  ", "\t", " \n "]),
)
def test_matcher_equals_oracle_scan(words, sep):
    text = sep.join(words)
    idx = build_matcher(SURFACES)
    spark_side = [s for s, _, _ in find_mentions(text, idx)]

    surf_map = {s.lower(): (s.lower(), "ns") for s in SURFACES}
    max_len = max(len(s.split()) for s in SURFACES)
    oracle_side = [t for t, _ in _scan(text, surf_map, max_len)]

    assert spark_side == oracle_side


@settings(max_examples=100, deadline=None)
@given(st.text(alphabet="abk αβ\t", min_size=0, max_size=40))
def test_matcher_never_crashes_on_garbage(text):
    idx = build_matcher(SURFACES)
    out = find_mentions(text, idx)
    # offsets are sane and non-overlapping
    toks = text.lower().split()
    prev_end = 0
    for surface, s, e in out:
        assert 0 <= s < e <= len(toks)
        assert s >= prev_end
        prev_end = e
        assert " ".join(toks[s:e]) == surface
