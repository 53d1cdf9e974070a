"""Cross-framework numerical parity: reference torch models vs covomix_tpu.

The reference CoVoMix / TextToSemantic modules are imported directly from
/root/reference (tiny configs, fixed seeds), their state dicts pushed through
covomix_tpu.checkpoint.torch_convert, and forward outputs compared at <=1e-4 —
the same bar as the vocoder parity test (test_vocoder.py). This validates the
entire converted-checkpoint path for both flagship models: a transposed weight,
wrong norm, rotary convention mismatch, or EOS-handling skew fails here.

Reference citations: CoVoMix.forward acoustic.py:430-538,
forward_with_cond_scale :414-428, masked loss :527-538; TextToSemantic.forward
text2semantic.py:851-1089, generate :662-848.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from conftest import reference_available, load_reference_covomix
from covomix_tpu.checkpoint import torch_convert as tc
from covomix_tpu.models import acoustic as A
from covomix_tpu.models import text2semantic as T

pytestmark = pytest.mark.skipif(not reference_available(), reason="reference repo not mounted")

HI = jax.default_matmul_precision("highest")


# ---------------------------------------------------------------------------
# acoustic (CoVoMix)


def _tiny_acoustic(mode="single", seed=0):
    ref_ac, _ = load_reference_covomix()
    torch.manual_seed(seed)
    kw = dict(
        num_phoneme_tokens=30,
        dim=64,
        depth=2,
        dim_head=16,
        heads=2,
        ff_mult=4,
        dim_phoneme_emb=48,
        conv_pos_embed_kernel_size=7,
        twocondition_twooutput=(mode == "two_two"),
        twocondition_oneoutput=(mode == "two_one"),
    )
    dim_in = 160 if mode in ("two_two", "two_one") else 80
    m = ref_ac.CoVoMix(dim_in=dim_in, **kw)
    m.eval()
    cfg = A.AcousticConfig(dim_in=dim_in, dim=64, depth=2, dim_head=16, heads=2,
                           dim_phoneme_emb=48, num_phoneme_tokens=30,
                           conv_pos_kernel=7, mode=mode)
    sd = {("cfm_wrapper.CoVoMix." + k): v for k, v in m.state_dict().items()}
    params = tc.convert_acoustic(sd, depth=2)
    return m, cfg, params


def _acoustic_inputs(cfg, b=2, t=24, seed=1):
    rng = np.random.RandomState(seed)
    x = rng.randn(b, t, cfg.mel_dim).astype(np.float32)
    cond = rng.randn(b, t, cfg.dim_in).astype(np.float32)
    ph_shape = (b, t, 2) if cfg.n_phoneme_streams == 2 else (b, t)
    ph = rng.randint(0, cfg.num_phoneme_tokens, ph_shape).astype(np.int64)
    times = rng.rand(b).astype(np.float32)
    return x, ph, cond, times


@pytest.mark.parametrize("mode", ["single", "two_two", "two_one"])
def test_acoustic_forward_parity(mode):
    m, cfg, params = _tiny_acoustic(mode)
    x, ph, cond, times = _acoustic_inputs(cfg)
    with torch.no_grad():
        ref = m(torch.from_numpy(x), phoneme_ids=torch.from_numpy(ph),
                cond=torch.from_numpy(cond), times=torch.from_numpy(times),
                cond_drop_prob=0.0).numpy()
    with HI:
        mine = np.asarray(A.forward(params, cfg, jnp.asarray(x), jnp.asarray(ph),
                                    jnp.asarray(cond), jnp.asarray(times)))
    np.testing.assert_allclose(mine, ref, atol=1e-4)


def test_acoustic_cfg_combine_parity():
    """forward_with_cond_scale: null branch (null_cond + null phoneme id) and
    the nonstandard combine logits*(1+s) - s*null (acoustic.py:414-428)."""
    m, cfg, params = _tiny_acoustic("single", seed=3)
    x, ph, cond, times = _acoustic_inputs(cfg, seed=4)
    scale = 0.7
    with torch.no_grad():
        ref = m.forward_with_cond_scale(
            torch.from_numpy(x), phoneme_ids=torch.from_numpy(ph),
            cond=torch.from_numpy(cond), times=torch.from_numpy(times),
            cond_scale=scale).numpy()
    b = x.shape[0]
    with HI:
        out_c = A.forward(params, cfg, jnp.asarray(x), jnp.asarray(ph), jnp.asarray(cond),
                          jnp.asarray(times), cond_drop_mask=jnp.zeros((b,), bool))
        out_n = A.forward(params, cfg, jnp.asarray(x), jnp.asarray(ph), jnp.asarray(cond),
                          jnp.asarray(times), cond_drop_mask=jnp.ones((b,), bool))
        mine = np.asarray(out_c * (1 + scale) - scale * out_n)
    np.testing.assert_allclose(mine, ref, atol=1e-4)


def test_acoustic_masked_loss_parity():
    """Training loss semantics: cond zeroed on the masked span, per-frame MSE,
    masked mean (acoustic.py:468-469, :527-538)."""
    m, cfg, params = _tiny_acoustic("single", seed=5)
    x, ph, cond, times = _acoustic_inputs(cfg, seed=6)
    b, t, _ = x.shape
    rng = np.random.RandomState(7)
    target = rng.randn(b, t, cfg.mel_dim).astype(np.float32)
    mask = rng.rand(b, t) < 0.6
    with torch.no_grad():
        ref = m(torch.from_numpy(x), phoneme_ids=torch.from_numpy(ph),
                cond=torch.from_numpy(cond), times=torch.from_numpy(times),
                cond_drop_prob=0.0, target=torch.from_numpy(target),
                mask=torch.from_numpy(mask)).item()
    with HI:
        cond_m = jnp.asarray(cond) * (~jnp.asarray(mask))[:, :, None]
        pred = A.forward(params, cfg, jnp.asarray(x), jnp.asarray(ph), cond_m, jnp.asarray(times))
        err = jnp.mean(jnp.square(pred - jnp.asarray(target)), axis=-1)
        err = jnp.where(jnp.asarray(mask), err, 0.0)
        num = jnp.sum(err, axis=-1)
        den = jnp.clip(jnp.sum(jnp.asarray(mask), axis=-1).astype(jnp.float32), min=1e-5)
        mine = float(jnp.mean(num / den))
    np.testing.assert_allclose(mine, ref, rtol=1e-4)


# ---------------------------------------------------------------------------
# text2semantic


def _tiny_t2s(two_output=False, seed=0, early_exit=0):
    _, ref_t2s = load_reference_covomix()
    torch.manual_seed(seed)
    m = ref_t2s.TextToSemantic(
        dim=48,
        source_depth=2,
        target_depth=2,
        num_text_token_ids=40,
        num_semantic_token_ids=30,
        dim_head=12,
        heads=4,
        two_output=two_output,
        target_transformer_dim=96 if two_output else 48,
        target_early_exit_layer=early_exit or None,
    )
    m.eval()
    cfg = T.T2SConfig(dim=48, source_depth=2, target_depth=2, dim_head=12, heads=4,
                      num_text_tokens=40, num_semantic_tokens=30,
                      target_dim=96 if two_output else 48, two_output=two_output,
                      target_early_exit_layer=early_exit)
    sd = {("cfm_wrapper.model." + k): v for k, v in m.state_dict().items()}
    params = tc.convert_t2s(sd, source_depth=2, target_depth=2)
    if early_exit:
        assert "early_exit" in params  # convert_t2s picks up the head
    return m, cfg, params


def _t2s_inputs(cfg, b=2, s=9, t=11, seed=1, two_output=False):
    rng = np.random.RandomState(seed)
    src = rng.randint(1, cfg.num_text_tokens, (b, s)).astype(np.int64)
    src[0, -2:] = cfg.text_pad_id
    tgt_shape = (b, t, 2) if two_output else (b, t)
    # no semantic_pad_id (-1) here: reference data pads targets with 501 == EOS
    # (data_module.py:853), never -1 — embedding -1 would crash the reference
    tgt = rng.randint(0, cfg.num_semantic_tokens, tgt_shape).astype(np.int64)
    return src, tgt


def test_t2s_loss_and_logits_parity():
    m, cfg, params = _tiny_t2s()
    src, tgt = _t2s_inputs(cfg)
    with torch.no_grad():
        ref_loss, ref_logits = m(torch.from_numpy(src), torch.from_numpy(tgt),
                                 source_type="text", target_type="speech",
                                 return_loss=True, return_logits=True)
    with HI:
        loss, logits = T.forward_loss(params, cfg, jnp.asarray(src), jnp.asarray(tgt),
                                      return_logits=True)
    # ref returns logits[:, :-1] rearranged to [B, V+1, T+1]
    mine_logits = np.asarray(logits)[:, :-1].transpose(0, 2, 1)
    np.testing.assert_allclose(float(loss), ref_loss.item(), rtol=1e-4)
    np.testing.assert_allclose(mine_logits, ref_logits.numpy(), atol=1e-4)


def test_t2s_two_output_loss_parity():
    m, cfg, params = _tiny_t2s(two_output=True, seed=2)
    src, tgt = _t2s_inputs(cfg, seed=3, two_output=True)
    with torch.no_grad():
        ref_loss, ref_logits = m(torch.from_numpy(src), torch.from_numpy(tgt),
                                 source_type="text", target_type="speech",
                                 return_loss=True, return_logits=True)
    with HI:
        loss, (logits1, _) = T.forward_loss(params, cfg, jnp.asarray(src), jnp.asarray(tgt),
                                            return_logits=True)
    mine1 = np.asarray(logits1)[:, :-1].transpose(0, 2, 1)
    np.testing.assert_allclose(float(loss), ref_loss.item(), rtol=1e-4)
    np.testing.assert_allclose(mine1, ref_logits.numpy(), atol=1e-4)


def test_t2s_early_exit_loss_parity():
    """Early-exit head CE for speculative decoding (text2semantic.py:1026-1046)."""
    m, cfg, params = _tiny_t2s(seed=4, early_exit=1)
    src, tgt = _t2s_inputs(cfg, seed=5)
    with torch.no_grad():
        ref_loss = m(torch.from_numpy(src), torch.from_numpy(tgt),
                     source_type="text", target_type="speech",
                     return_loss=True, return_early_exit_loss=True)
    with HI:
        loss = T.forward_loss(params, cfg, jnp.asarray(src), jnp.asarray(tgt))
    np.testing.assert_allclose(float(loss), ref_loss.item(), rtol=1e-4)


def _near_greedy_decode_ref(m, src, max_length):
    _, ref_t2s = load_reference_covomix()
    with torch.no_grad():
        out = m.generate(torch.from_numpy(src), source_type="text", target_type="speech",
                         temperature=1e-8, max_length=max_length)
    return out.numpy()


def test_t2s_generate_near_greedy_parity():
    """End-to-end AR decode parity (KV cache, rotary offsets, EOS handling):
    at temperature→0 both loops are argmax decoders, so the token sequences
    must match position-for-position (text2semantic.py:749-826)."""
    m, cfg, params = _tiny_t2s(seed=8)
    src = np.random.RandomState(9).randint(1, cfg.num_text_tokens, (2, 7)).astype(np.int64)
    L = 24
    ref_tokens = _near_greedy_decode_ref(m, src, L)
    with HI:
        res = T.generate(params, cfg, jax.random.PRNGKey(0), jnp.asarray(src),
                         max_length=L, temperature=1e-8, top_k_thres=0.1)
    mine = np.asarray(res.tokens)
    n = ref_tokens.shape[1]
    # reference stops the loop the step all rows have EOS; ours runs the same
    # number of steps — compare the common prefix and the post-EOS padding
    np.testing.assert_array_equal(mine[:, :n], ref_tokens)
    assert (mine[:, n:] == cfg.semantic_pad_id).all()


def test_t2s_two_output_generate_near_greedy_parity():
    m, cfg, params = _tiny_t2s(two_output=True, seed=12)
    src = np.random.RandomState(13).randint(1, cfg.num_text_tokens, (1, 6)).astype(np.int64)
    L = 16
    ref_flat = _near_greedy_decode_ref(m, src, L)  # [B, 2n] (streams concatenated)
    n = ref_flat.shape[1] // 2
    ref1, ref2 = ref_flat[:, :n], ref_flat[:, n:]
    with HI:
        res = T.generate(params, cfg, jax.random.PRNGKey(0), jnp.asarray(src),
                         max_length=L, temperature=1e-8)
    mine1, mine2 = np.asarray(res.tokens), np.asarray(res.tokens2)
    np.testing.assert_array_equal(mine1[:, :n], ref1)
    np.testing.assert_array_equal(mine2[:, :n], ref2)


# ---------------------------------------------------------------------------
# EMA alignment against the real models (torch_ema ordering = deduped
# requires_grad parameters in registration order)


def _ema_roundtrip(module, prefix):
    sd = {prefix + k: v for k, v in module.state_dict().items()}
    trainable = [p for p in module.parameters() if p.requires_grad]
    shadow = [torch.full_like(p, float(i + 1)) for i, p in enumerate(trainable)]
    swapped = tc.apply_ema(sd, {"shadow_params": shadow, "decay": 0.999, "num_updates": 3})
    # every trainable param (and every tied alias) received its shadow
    named = dict(module.named_parameters(remove_duplicate=False))
    canon = {}
    for i, p in enumerate(module.parameters()):
        if p.requires_grad:
            canon[p.data_ptr()] = None
    expect = {}
    idx = 0
    seen = set()
    for name, p in module.named_parameters(remove_duplicate=True):
        if not p.requires_grad:
            continue
        expect[p.data_ptr()] = float(idx + 1)
        idx += 1
    for name, p in named.items():
        if not p.requires_grad:
            np.testing.assert_array_equal(swapped[prefix + name].numpy(), p.detach().numpy())
            continue
        want = expect[p.data_ptr()]
        got = swapped[prefix + name]
        assert float(got.flatten()[0]) == want, f"{name}: got {float(got.flatten()[0])}, want {want}"


def test_apply_ema_roundtrip_acoustic():
    m, _, _ = _tiny_acoustic("single", seed=21)
    _ema_roundtrip(m, "cfm_wrapper.CoVoMix.")


def test_apply_ema_roundtrip_t2s_tied_weights():
    m, _, _ = _tiny_t2s(seed=22)
    _ema_roundtrip(m, "cfm_wrapper.model.")
