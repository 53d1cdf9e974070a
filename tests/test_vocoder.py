"""HiFi-GAN vocoder: torch parity (generator), discriminator/loss smoke."""

import functools
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from covomix_tpu.models import vocoder as V
from conftest import REFERENCE, reference_available

TINY = V.VocoderConfig(upsample_initial_channel=32)


def _torch_generator():
    sys.path.insert(0, REFERENCE)
    from covomix.vocoder.models import Generator
    from covomix.vocoder.env import AttrDict

    h = AttrDict(dict(resblock="1", upsample_rates=[5, 4, 4, 2], upsample_kernel_sizes=[8, 8, 4, 4],
                      upsample_initial_channel=32, resblock_kernel_sizes=[3, 7, 11],
                      resblock_dilation_sizes=[[1, 3, 5], [1, 3, 5], [1, 3, 5]]))
    torch.manual_seed(0)
    g = Generator(h)
    g.eval()
    return g


def _convert(g):
    def conv_w(c):
        return {"w": jnp.asarray(c.weight.detach().numpy().transpose(2, 1, 0)), "b": jnp.asarray(c.bias.detach().numpy())}

    def convt_w(c):
        return {"w": jnp.asarray(c.weight.detach().numpy().transpose(2, 0, 1)), "b": jnp.asarray(c.bias.detach().numpy())}

    return {
        "conv_pre": conv_w(g.conv_pre),
        "ups": [convt_w(u) for u in g.ups],
        "resblocks": [{"convs1": [conv_w(c) for c in rb.convs1], "convs2": [conv_w(c) for c in rb.convs2]} for rb in g.resblocks],
        "conv_post": conv_w(g.conv_post),
    }


@pytest.mark.skipif(not reference_available(), reason="reference repo not mounted")
def test_generator_parity_vs_torch():
    g = _torch_generator()
    g.remove_weight_norm()
    params = _convert(g)
    mel = np.random.RandomState(0).randn(1, 80, 37).astype(np.float32)
    with torch.no_grad():
        ref = g(torch.from_numpy(mel)).numpy()[0, 0]
    with jax.default_matmul_precision("highest"):
        mine = np.asarray(jax.jit(functools.partial(V.generator, cfg=TINY))(params, mel=jnp.asarray(mel.transpose(0, 2, 1))))[0]
    assert mine.shape == ref.shape  # (T-1)*u+k-2p chain == torch ConvTranspose chain
    np.testing.assert_allclose(mine, ref, atol=1e-4)


@pytest.mark.skipif(not reference_available(), reason="reference repo not mounted")
def test_weight_norm_fold_matches_remove_weight_norm():
    from covomix_tpu.checkpoint.torch_convert import convert_hifigan_generator

    g = _torch_generator()  # weight-normed
    sd = {k: v for k, v in g.state_dict().items()}
    params = convert_hifigan_generator(sd, num_ups=4)
    g.remove_weight_norm()
    ref_params = _convert(g)
    flat_a = jax.tree_util.tree_leaves(params)
    flat_b = jax.tree_util.tree_leaves(ref_params)
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_output_length_formula():
    cfg = TINY
    params = jax.jit(V.init_generator, static_argnums=1)(jax.random.PRNGKey(0), cfg)
    mel = jnp.zeros((1, 10, 80))
    wav = jax.jit(functools.partial(V.generator, cfg=cfg))(params, mel=mel)
    assert wav.shape == (1, 10 * 160 + 32)
    assert V.output_length(cfg, 10) == 10 * 160 + 32
    assert np.abs(np.asarray(wav)).max() <= 1.0  # tanh bounded


def test_discriminators_and_losses():
    key = jax.random.PRNGKey(1)
    mpd_p = V.init_mpd(key)
    msd_p = V.init_msd(key)
    y = jax.random.normal(key, (2, 1600)) * 0.1
    y_hat = jax.random.normal(jax.random.PRNGKey(2), (2, 1600)) * 0.1

    @jax.jit
    def all_losses(mpd_p, msd_p, y, y_hat):
        rs, gs, fr, fg = V.mpd(mpd_p, y, y_hat)
        l_mpd = V.discriminator_loss(rs, gs)
        rs2, gs2, fr2, fg2 = V.msd(msd_p, y, y_hat)
        l_msd = V.discriminator_loss(rs2, gs2)
        l_fm = V.feature_loss(fr, fg) + V.feature_loss(fr2, fg2)
        l_gen = V.generator_adv_loss(gs) + V.generator_adv_loss(gs2)
        return l_mpd, l_msd, l_fm, l_gen

    l_mpd, l_msd, l_fm, l_gen = all_losses(mpd_p, msd_p, y, y_hat)
    for l in (l_mpd, l_msd, l_fm, l_gen):
        assert np.isfinite(float(l))


@pytest.mark.skipif(not reference_available(), reason="reference repo not mounted")
def test_mpd_parity_vs_torch():
    sys.path.insert(0, REFERENCE)
    sys.path.insert(0, REFERENCE + "/hifi-gan")
    from models import DiscriminatorP

    torch.manual_seed(3)
    d = DiscriminatorP(3)
    d.eval()
    # fold weight norm into plain weights for conversion
    for m in d.modules():
        if isinstance(m, torch.nn.Conv2d):
            torch.nn.utils.remove_weight_norm(m)
    convs = [{"w": jnp.asarray(c.weight.detach().numpy().transpose(2, 3, 1, 0)), "b": jnp.asarray(c.bias.detach().numpy())} for c in d.convs]
    post = {"w": jnp.asarray(d.conv_post.weight.detach().numpy().transpose(2, 3, 1, 0)), "b": jnp.asarray(d.conv_post.bias.detach().numpy())}
    p = {"convs": convs, "conv_post": post}
    x = np.random.RandomState(4).randn(1, 301).astype(np.float32) * 0.1
    with torch.no_grad():
        ref, ref_fmaps = d(torch.from_numpy(x[None]))
    with jax.default_matmul_precision("highest"):
        mine, fmaps = V._disc_p(p, jnp.asarray(x), period=3)
    np.testing.assert_allclose(np.asarray(mine)[0], ref.numpy()[0], atol=1e-4)


def test_packed_mrf_matches_unpacked():
    """The block-diagonal branch-packed MRF (stage channels where 3C <= 128,
    i.e. the covomix config's final 31-channel stage) must be numerically
    identical to the three separate ResBlock1 branches."""
    cfg = V.VocoderConfig()
    C = 31
    key = jax.random.PRNGKey(7)
    blocks = [V._resblock1_init(jax.random.fold_in(key, j), C, cfg.resblock_kernel_sizes[j],
                                cfg.resblock_dilation_sizes[j]) for j in range(3)]
    x = jax.random.normal(jax.random.fold_in(key, 9), (2, 300, C), jnp.float32)
    with jax.default_matmul_precision("highest"):
        acc = None
        for j in range(3):
            y = V._resblock1(blocks[j], x, cfg.resblock_kernel_sizes[j], cfg.resblock_dilation_sizes[j])
            acc = y if acc is None else acc + y
        ref = acc / 3
        assert V._can_pack_mrf(cfg, C)
        packed = V._mrf_packed(blocks, x, C, cfg.resblock_kernel_sizes, cfg.resblock_dilation_sizes)
    np.testing.assert_allclose(np.asarray(packed), np.asarray(ref), atol=1e-5)
    # 62-channel stage must NOT pack (3C=186 is FLOP-bound territory)
    assert not V._can_pack_mrf(cfg, 62)


def test_generator_valid_len_bucketed_equals_exact():
    """Bucket-padded vocoding with valid_len must equal exact-length vocoding
    bit-for-bit over the valid output span — pad frames are re-zeroed after
    every conv so the generator's receptive field sees the same zero padding
    an exact-length run would (fixes the hifigan_inference bucketing
    approximation flagged in round-2 ADVICE). Config chosen so the first MRF
    stage runs UNPACKED (3*48 > 128) and later stages packed — both paths
    masked."""
    cfg = V.VocoderConfig(upsample_initial_channel=96)
    params = jax.jit(V.init_generator, static_argnums=1)(jax.random.PRNGKey(3), cfg)
    rs = np.random.RandomState(0)
    t, tb = 11, 24
    mel = rs.randn(1, t, 80).astype(np.float32)
    mel_padded = np.full((1, tb, 80), -15.0, np.float32)  # MEL_PAD fill
    mel_padded[0, :t] = mel[0]
    with jax.default_matmul_precision("highest"):
        exact = np.asarray(V.generator(params, cfg, jnp.asarray(mel)))[0]
        bucketed = np.asarray(V.generator(params, cfg, jnp.asarray(mel_padded),
                                          valid_len=jnp.int32(t)))[0]
        unmasked = np.asarray(V.generator(params, cfg, jnp.asarray(mel_padded)))[0]
    n = len(exact)
    assert np.abs(bucketed[:n] - exact).max() < 1e-5
    # documented: without the mask the pad fill perturbs the tail
    assert np.abs(unmasked[:n] - exact).max() > 1e-4


def test_generator_valid_len_per_row():
    """[B] per-row valid_len: each row equals its own exact-length run."""
    cfg = V.VocoderConfig(upsample_initial_channel=32)
    params = jax.jit(V.init_generator, static_argnums=1)(jax.random.PRNGKey(4), cfg)
    rs = np.random.RandomState(1)
    tb = 16
    lens = [16, 5, 9]
    mel = rs.randn(3, tb, 80).astype(np.float32)
    with jax.default_matmul_precision("highest"):
        batched = np.asarray(V.generator(params, cfg, jnp.asarray(mel),
                                         valid_len=jnp.asarray(np.array(lens, np.int32))))
        for i, n in enumerate(lens):
            exact = np.asarray(V.generator(params, cfg, jnp.asarray(mel[i:i + 1, :n])))[0]
            assert np.abs(batched[i, : len(exact)] - exact).max() < 1e-5, f"row {i}"
