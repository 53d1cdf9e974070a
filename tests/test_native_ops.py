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
