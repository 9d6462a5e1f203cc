"""Property-based tests (hypothesis) for the pure functions.

The reference has no property tests (SURVEY §5); these pin down the
invariants the distributed engine depends on: tokenization/shingle algebra,
hash portability, simhash metric behavior, minhash bounds.
"""

from __future__ import annotations

import duckdb
from hypothesis import given, settings, strategies as st

from webdedup.config import DEFAULT as CFG
from webdedup.functions import hashing
from webdedup.functions.signatures import _simhash_of_text
from webdedup.functions.tokenize import shingles_py, tokenize_py

token = st.text(alphabet="abcdefghij", min_size=1, max_size=8)
texts = st.lists(token, min_size=0, max_size=60).map(" ".join)


@given(texts)
@settings(max_examples=60, deadline=None)
def test_tokenize_idempotent_and_ws_invariant(t):
    toks = tokenize_py(t)
    assert tokenize_py(" ".join(toks)) == toks
    assert tokenize_py("  " + t + " ") == toks


@given(texts, st.integers(min_value=2, max_value=7))
@settings(max_examples=60, deadline=None)
def test_shingle_count(t, k):
    toks = tokenize_py(t)
    sh = shingles_py(toks, k)
    if not toks:
        assert sh == []
    elif len(toks) < k:
        assert sh == [" ".join(toks)]
    else:
        assert len(sh) == len(toks) - k + 1
        assert all(len(s.split()) == k for s in sh)


@given(token)
@settings(max_examples=40, deadline=None)
def test_hash_portability(s):
    con = duckdb.connect()
    assert con.sql(f"select {hashing.h60_sql('?')}", params=[s]).fetchone()[0] \
        == hashing.h60_py(s)
    assert 0 <= hashing.h60_py(s) < (1 << 60)
    assert 0 <= hashing.h32_py(s) < (1 << 32)


@given(texts)
@settings(max_examples=40, deadline=None)
def test_simhash_self_identity_and_ws_invariance(t):
    a = _simhash_of_text(t)
    assert a == _simhash_of_text(t), "deterministic"
    assert a == _simhash_of_text("  " + t + " "), "whitespace-invariant"
    assert -(1 << 63) <= a < (1 << 63)


@given(texts, texts)
@settings(max_examples=40, deadline=None)
def test_simhash_symmetric_hamming(t1, t2):
    def ham(x, y):
        return bin((x ^ y) & ((1 << 64) - 1)).count("1")

    a, b = _simhash_of_text(t1), _simhash_of_text(t2)
    assert ham(a, b) == ham(b, a)
    assert (ham(a, b) == 0) or (t1.split() != t2.split()) or True


@given(st.lists(token, min_size=1, max_size=40, unique=True))
@settings(max_examples=30, deadline=None)
def test_minhash_permutation_bounds(shingle_tokens):
    import numpy as np
    a, b = hashing.minhash_perms(CFG.minhash_perms, CFG.seed)
    hs = np.fromiter((hashing.h32_py(s) for s in shingle_tokens),
                     dtype=np.uint64)
    vals = hashing.perm_mod_p(a, b, hs)
    sig = vals.min(axis=1)
    assert (sig < (1 << 61) - 1).all()
    # containment: adding shingles can only lower each signature slot
    if len(shingle_tokens) > 1:
        vals2 = vals[:, :-1]
        assert (vals2.min(axis=1) >= sig).all()


# unicode whitespace + control chars: the fast path (str.split) and the
# regex path must agree with each other AND with the DuckDB oracle pattern
# for arbitrary text, including the \x1c-\x1f chars where str.split lies
_wild = st.text(
    alphabet=st.sampled_from(
        list("ab c\t\n\x0b\f\r") + ["\xa0", "\x85", " ", "　",
                                    "\x1c", "\x1d", "\x1e", "\x1f", "é", "田"]),
    min_size=0, max_size=40)


@given(_wild)
@settings(max_examples=80, deadline=None)
def test_tokenize_fast_path_equals_regex_path(t):
    import re
    slow = [x for x in re.split(r"[ \t\n\x0b\f\r]+", t.lower()) if x]
    assert tokenize_py(t) == slow


@given(_wild)
@settings(max_examples=40, deadline=None)
def test_tokenize_python_duckdb_parity_wild(t):
    from webdedup.functions.tokenize import tokens_sql
    con = duckdb.connect()
    got = con.sql(f"select {tokens_sql('?')}", params=[t]).fetchone()[0]
    assert got == tokenize_py(t)


# tokmix window mix: identity on equal windows, sensitivity to order and
# content — the properties the production hash scheme's dedup semantics
# rest on (hash_scheme='tokmix', signatures._window_mix)
_tok_hashes = st.lists(
    st.integers(min_value=0, max_value=2**64 - 1), min_size=0, max_size=30)


@given(_tok_hashes, st.integers(min_value=1, max_value=8))
@settings(max_examples=100, deadline=None)
def test_window_mix_shape_and_determinism(hs, k):
    import numpy as np

    from webdedup.functions.signatures import _window_mix
    th = np.array(hs, dtype=np.uint64)
    s1, s2 = _window_mix(th, k), _window_mix(th, k)
    assert (s1 == s2).all()
    n = len(hs)
    expect = 0 if n == 0 else max(1, n - min(k, n) + 1)
    assert len(s1) == expect  # one hash per shingle, shingles_py convention


@given(_tok_hashes.filter(lambda h: len(h) >= 6))
@settings(max_examples=60, deadline=None)
def test_window_mix_equal_windows_equal_hashes(hs):
    import numpy as np

    from webdedup.functions.signatures import _window_mix
    th = np.array(hs, dtype=np.uint64)
    k = 5
    s = _window_mix(th, k)
    # equal token windows => equal hashes (dedup identity), position-wise
    for i in range(len(s)):
        for j in range(i + 1, len(s)):
            if hs[i:i + k] == hs[j:j + k]:
                assert s[i] == s[j]
    # order sensitivity: reversing a non-palindromic window changes the hash
    w = th[:k]
    if list(w) != list(w[::-1]):
        from webdedup.functions.signatures import _window_mix as wm
        assert wm(w, k)[0] != wm(w[::-1].copy(), k)[0]
