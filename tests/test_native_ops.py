"""Native runtime helpers (C++ via ctypes + numpy fallbacks) and the jnp
ngram-repeat-block op (SURVEY §2.5 rows)."""

import itertools

import numpy as np
import jax.numpy as jnp
import pytest

from covomix_tpu import native
from covomix_tpu.ops import sampling as S


# ---------------------------------------------------------------------------
# balanced_assignment (fairseq libbase capability: BASE-layer EP routing)


def _total_score(scores, owner):
    return float(scores[np.arange(len(owner)), owner].sum())


def _brute_force_best(scores, k):
    """Optimal balanced assignment by exhaustive search (tiny sizes only)."""
    t, e = scores.shape
    best = -np.inf
    for perm in itertools.permutations(range(t)):
        owner = np.empty(t, np.int64)
        for ex in range(e):
            for j in perm[ex * k:(ex + 1) * k]:
                owner[j] = ex
        best = max(best, _total_score(scores, owner))
    return best


@pytest.mark.parametrize("t,e", [(6, 2), (6, 3), (8, 4)])
def test_balanced_assignment_balance_and_near_optimality(t, e):
    rng = np.random.RandomState(t * 10 + e)
    scores = rng.randn(t, e).astype(np.float32)
    owner = native.balanced_assignment(scores)
    assert owner.shape == (t,)
    counts = np.bincount(owner, minlength=e)
    assert (counts == t // e).all(), counts             # exactly balanced
    got = _total_score(scores, owner)
    best = _brute_force_best(scores, t // e)
    # auction is eps-optimal: within e*eps of the optimum
    eps = max((scores.max() - scores.min()) / 50.0, 1e-4)
    assert got >= best - t * eps - 1e-4, (got, best)


def test_balanced_assignment_python_fallback_matches_semantics():
    rng = np.random.RandomState(0)
    scores = rng.randn(12, 4).astype(np.float32)
    # exercise the numpy fallback directly by simulating a missing library
    lib_backup = native._lib
    try:
        native._lib = False
        owner_py = native.balanced_assignment(scores)
    finally:
        native._lib = lib_backup
    counts = np.bincount(owner_py, minlength=4)
    assert (counts == 3).all()
    if native.native_available():
        owner_c = native.balanced_assignment(scores)
        # both are eps-optimal; scores must be within tolerance of each other
        assert abs(_total_score(scores, owner_c) - _total_score(scores, owner_py)) \
            <= 12 * max((scores.max() - scores.min()) / 50.0, 1e-4) + 1e-4


def test_balanced_assignment_prefers_high_affinity():
    # block-diagonal affinity: the assignment must recover the blocks
    scores = np.full((8, 2), -1.0, np.float32)
    scores[:4, 0] = 1.0
    scores[4:, 1] = 1.0
    owner = native.balanced_assignment(scores)
    assert (owner[:4] == 0).all() and (owner[4:] == 1).all()


# ---------------------------------------------------------------------------
# ban_repeated_ngrams (fairseq ngram_repeat_block capability, pure jnp)


def _ref_banned(tokens, cur_len, n):
    """Reference semantics: ban x iff tokens[cur_len-(n-1):cur_len] + [x]
    equals some n-gram tokens[j:j+n] with j+n <= cur_len."""
    seq = list(tokens[:cur_len])
    if cur_len < n:
        return set()
    prefix = tuple(seq[cur_len - (n - 1):]) if n > 1 else ()
    banned = set()
    for j in range(cur_len - n + 1):
        if tuple(seq[j:j + n - 1]) == prefix:
            banned.add(seq[j + n - 1])
    return banned


@pytest.mark.parametrize("n", [1, 2, 3])
def test_ban_repeated_ngrams_matches_reference(n):
    rng = np.random.RandomState(n)
    b, l, v = 3, 16, 11
    tokens = rng.randint(0, v, (b, l)).astype(np.int32)
    for cur_len in [0, 1, n, 7, l - 1]:
        logits = jnp.zeros((b, v))
        out = np.asarray(S.ban_repeated_ngrams(logits, jnp.asarray(tokens),
                                               jnp.int32(cur_len), n))
        for row in range(b):
            want = _ref_banned(tokens[row], cur_len, n)
            got = set(np.flatnonzero(out[row] <= S.NEG_INF / 2).tolist())
            assert got == want, (n, cur_len, row, got, want)


def test_generate_with_ngram_block_runs():
    import jax
    from covomix_tpu.models import text2semantic as T

    cfg = T.T2SConfig(dim=32, source_depth=1, target_depth=1, heads=2, dim_head=16,
                      num_text_tokens=50, num_semantic_tokens=20)
    params = T.init(jax.random.PRNGKey(0), cfg)
    src = jnp.asarray(np.random.RandomState(0).randint(1, 50, (2, 8)))
    out = T.generate(params, cfg, jax.random.PRNGKey(1), src, max_length=24,
                     min_length=24, no_repeat_ngram_size=2, temperature=0.0)
    toks = np.asarray(out.tokens)
    # greedy decode with 2-gram blocking: no repeated bigram before EOS/pad
    for row in toks:
        row = row[row != cfg.semantic_pad_id]
        row = row[row != cfg.semantic_eos_id]
        bigrams = list(zip(row[:-1], row[1:]))
        assert len(bigrams) == len(set(bigrams)), bigrams


# ---------------------------------------------------------------------------
# BLEU scorer (fairseq libbleu capability: clipped corpus BLEU with pad/eos
# trimming and unk-never-matches; C++ path + python fallback share semantics)


def _both_backends(fn):
    """Run fn() on the C++ path and on the forced python fallback; return both."""
    res_c = fn() if native.native_available() else None
    lib_backup = native._lib
    try:
        native._lib = False
        res_py = fn()
    finally:
        native._lib = lib_backup
    return res_c, res_py


def test_bleu_perfect_match_is_100():
    def run():
        sc = native.BleuScorer(pad=1, eos=2, unk=3)
        sc.add([5, 6, 7, 8, 9, 2], [5, 6, 7, 8, 9, 2])
        return sc.score()

    c, py = _both_backends(run)
    assert abs(py - 100.0) < 1e-9
    if c is not None:
        assert abs(c - py) < 1e-9


def test_bleu_known_value():
    """Hand-computed clipped BLEU: ref 'the cat sat on the mat', pred
    'the cat the cat on the mat' (classic clipping example)."""
    ref = [10, 11, 12, 13, 10, 14]
    pred = [10, 11, 10, 11, 13, 10, 14]

    def run():
        sc = native.BleuScorer(pad=0, eos=99, unk=98)
        sc.add(ref, pred)
        return sc.precision(), sc.score()

    c, py = _both_backends(run)
    prec, score = py
    # 1-grams: pred counts {10:3, 11:2, 13:1, 14:1}; ref {10:2, 11:1, 12:1,
    # 13:1, 14:1} -> clipped matches 2+1+1+1 = 5 of 7
    assert abs(prec[0] - 5 / 7) < 1e-12
    # 2-grams: pred [10-11, 11-10, 10-11, 11-13, 13-10, 10-14]; ref has 10-11
    # x1, 13-10 x1, 10-14 x1 -> 3 of 6
    assert abs(prec[1] - 3 / 6) < 1e-12
    if c is not None:
        cp, cs = c
        np.testing.assert_allclose(cp, prec, atol=1e-12)
        assert abs(cs - score) < 1e-9


def test_bleu_trim_and_unk_and_brevity():
    def run():
        sc = native.BleuScorer(pad=1, eos=2, unk=3)
        # leading pads + trailing eos trimmed on BOTH sides; ref unk (3) never
        # matches the pred's literal 3
        sc.add([1, 1, 5, 3, 7, 2], [5, 3, 7, 2, 1])
        return np.array(sc.stat), sc.brevity()

    c, py = _both_backends(run)
    stat, bp = py
    assert stat[0] == 3 and stat[1] == 3     # reflen, predlen after trim
    assert stat[2] == 3 and stat[3] == 2     # unigrams: 5 and 7 match, unk not
    assert bp == 1.0
    if c is not None:
        np.testing.assert_array_equal(c[0], stat)


def test_bleu_one_init_smoothing_and_accumulation():
    def run():
        sc = native.BleuScorer(pad=0, eos=9)
        sc.reset(one_init=True)
        sc.add([4, 5, 6], [4, 5, 7])
        sc.add([4, 5, 6], [4, 5, 6])
        return np.array(sc.stat), sc.score()

    c, py = _both_backends(run)
    stat, score = py
    assert stat[0] == 6 and stat[1] == 6
    assert stat[2] == 6 and stat[3] == 5          # unigram: 2/3 + 3/3
    assert stat[4] == 4 + 1 and stat[5] == 3 + 1  # bigram + one_init smoothing
    assert 0.0 < score <= 100.0
    if c is not None:
        np.testing.assert_array_equal(c[0], stat)
        assert abs(c[1] - score) < 1e-9


def test_bleu_random_backend_parity():
    rng = np.random.RandomState(7)

    def run():
        sc = native.BleuScorer(pad=1, eos=2, unk=3)
        r2 = np.random.RandomState(7)
        for _ in range(20):
            ref = r2.randint(1, 12, size=r2.randint(1, 30))
            pred = r2.randint(1, 12, size=r2.randint(1, 30))
            sc.add(ref, pred)
        return np.array(sc.stat)

    c, py = _both_backends(run)
    if c is not None:
        np.testing.assert_array_equal(c, py)


# ---------------------------------------------------------------------------
# token-block slicing (fairseq token_block_utils_fast capability)


def test_token_block_slices_none_mode():
    def run():
        return native.token_block_slices([3, 5, 2], block_size=4, break_mode="none")

    c, py = _both_backends(run)
    np.testing.assert_array_equal(py, [[0, 4], [4, 8], [8, 10]])
    if c is not None:
        np.testing.assert_array_equal(c, py)


def test_token_block_slices_complete_mode():
    def run():
        # sentences packed whole; a 7-size sentence exceeds block alone but is
        # kept (curr_size == 0 branch, token_block_utils_fast.pyx:67-77)
        return native.token_block_slices([3, 2, 7, 1, 1], block_size=5, break_mode="complete")

    c, py = _both_backends(run)
    np.testing.assert_array_equal(py, [[0, 5], [5, 12], [12, 14]])
    if c is not None:
        np.testing.assert_array_equal(c, py)


def test_token_block_slices_complete_doc_mode():
    def run():
        # doc-sep rows (size == document_sep_len) end documents and are
        # excluded; single-token blocks dropped (pyx:79-97 'curr_size > 1')
        return native.token_block_slices([3, 2, 1, 4, 1, 1], block_size=5,
                                         break_mode="complete_doc", document_sep_len=1)

    c, py = _both_backends(run)
    np.testing.assert_array_equal(py, [[0, 5], [6, 10]])
    if c is not None:
        np.testing.assert_array_equal(c, py)


def test_token_block_slices_eos_mode_and_index():
    def run():
        sl = native.token_block_slices([2, 0, 3], block_size=99, break_mode="eos")
        idx = native.block_to_dataset_index([2, 0, 3], sl)
        return sl, idx

    c, py = _both_backends(run)
    sl, idx = py
    np.testing.assert_array_equal(sl, [[0, 2], [2, 2], [2, 5]])
    # boundary flat index stays on the first sequence starting there — the
    # zero-length row itself (DatasetSearcher semantics, pyx:160-186)
    np.testing.assert_array_equal(idx, [[0, 0, 0], [1, 0, 1], [1, 0, 2]])
    if c is not None:
        np.testing.assert_array_equal(c[0], sl)
        np.testing.assert_array_equal(c[1], idx)


def test_block_to_dataset_index_spanning():
    def run():
        sl = native.token_block_slices([3, 5, 2], block_size=4, break_mode="none")
        return native.block_to_dataset_index([3, 5, 2], sl)

    c, py = _both_backends(run)
    # block [0,4) spans ds 0..1; [4,8) inside ds 1 (offset 1); [8,10) is ds 2
    np.testing.assert_array_equal(py, [[0, 0, 1], [1, 1, 1], [2, 0, 2]])
    if c is not None:
        np.testing.assert_array_equal(c, py)
