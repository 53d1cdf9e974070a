"""Tests for the DDPM/DDIM schedule helpers and mcep/f0 utilities.

Reference surface: covomix/util/DDPM_utils.py:226-301 and
covomix/covomix_model/utils.py:1-60 (dead code there — broken imports — but
part of the public surface; see the module docstrings).
"""

import numpy as np
import pytest

from covomix_tpu.audio import mcep_f0 as M
from covomix_tpu.util import ddpm_schedules as S


# ---------------------------------------------------------------- schedules
def test_beta_linear_matches_formula():
    b = S.make_beta_schedule("linear", 10, linear_start=1e-4, linear_end=2e-2)
    expect = np.linspace(1e-2, np.sqrt(2e-2), 10) ** 2
    assert b.shape == (10,) and b.dtype == np.float64
    np.testing.assert_allclose(b[0], 1e-4, rtol=1e-12)
    np.testing.assert_allclose(b[-1], 2e-2, rtol=1e-12)
    np.testing.assert_allclose(b, expect, rtol=1e-12)


def test_beta_cosine_bounded_and_increasing():
    b = S.make_beta_schedule("cosine", 50)
    assert np.all(b >= 0) and np.all(b <= 0.999)
    assert np.all(np.diff(b[:-1]) > 0)  # cosine betas grow until the clip


def test_beta_sqrt_variants_and_unknown():
    b1 = S.make_beta_schedule("sqrt_linear", 5, 1e-4, 2e-2)
    np.testing.assert_allclose(b1, np.linspace(1e-4, 2e-2, 5))
    b2 = S.make_beta_schedule("sqrt", 5, 1e-4, 2e-2)
    np.testing.assert_allclose(b2, np.linspace(1e-4, 2e-2, 5) ** 0.5)
    with pytest.raises(ValueError):
        S.make_beta_schedule("nope", 5)


def test_ddim_timesteps_uniform_and_quad():
    t = S.make_ddim_timesteps("uniform", 5, 100, verbose=False)
    np.testing.assert_array_equal(t, np.array([0, 20, 40, 60, 80]) + 1)
    q = S.make_ddim_timesteps("quad", 8, 100, verbose=False)
    assert q[0] == 1 and q[-1] <= 100 and np.all(np.diff(q) >= 0)
    with pytest.raises(NotImplementedError):
        S.make_ddim_timesteps("nope", 5, 100, verbose=False)


def test_ddim_sampling_parameters_eta():
    acum = np.cumprod(1 - S.make_beta_schedule("linear", 100))
    ts = S.make_ddim_timesteps("uniform", 10, 100, verbose=False) - 1
    sig0, al, alp = S.make_ddim_sampling_parameters(acum, ts, eta=0.0, verbose=False)
    assert np.all(sig0 == 0)
    np.testing.assert_allclose(al, acum[ts])
    np.testing.assert_allclose(alp[1:], acum[ts[:-1]])
    assert alp[0] == acum[0]
    sig1, _, _ = S.make_ddim_sampling_parameters(acum, ts, eta=1.0, verbose=False)
    expect = np.sqrt((1 - alp) / (1 - al) * (1 - al / alp))
    np.testing.assert_allclose(sig1, expect, rtol=1e-12)


def test_betas_for_alpha_bar():
    ab = lambda t: np.cos((t + 0.008) / 1.008 * np.pi / 2) ** 2  # noqa: E731
    b = S.betas_for_alpha_bar(20, ab)
    assert b.shape == (20,) and np.all(b <= 0.999) and np.all(b >= 0)
    np.testing.assert_allclose(b[3], 1 - ab(4 / 20) / ab(3 / 20), rtol=1e-12)


def test_extract_into_tensor():
    import jax.numpy as jnp
    a = jnp.arange(10.0) * 2
    t = jnp.array([3, 0, 7])
    out = S.extract_into_tensor(a, t, (3, 4, 5))
    assert out.shape == (3, 1, 1)
    np.testing.assert_allclose(np.asarray(out).ravel(), [6.0, 0.0, 14.0])


# ------------------------------------------------------------------ mcep/f0
def test_f0_to_coarse_mapping():
    f0 = np.array([0.0, M.F0_MIN, 220.0, M.F0_MAX, 2000.0, 20.0])
    c = M.f0_to_coarse(f0)
    assert c[0] == 0            # exactly-zero mel passes both masks untouched
    assert c[1] == 1            # f0_min -> bin 1
    assert c[5] == 1            # sub-f0_min (negative after scaling) -> bin 1
    assert c[3] == M.F0_BIN - 1  # f0_max -> top bin
    assert c[4] == M.F0_BIN - 1  # clamp above
    assert 1 < c[2] < M.F0_BIN - 1
    mono = M.f0_to_coarse(np.linspace(60, 1000, 50))
    assert np.all(np.diff(mono) >= 0)


def test_mcep_recovers_in_model_spectrum():
    rng = np.random.default_rng(0)
    order = 24
    n_freq = 257
    B = M._warp_basis(n_freq, order, M.ALPHA)
    c_true = rng.normal(size=order + 1) * 0.3 / (1 + np.arange(order + 1))
    spec = np.exp(B @ c_true)
    c = M.mcep(spec, order)
    np.testing.assert_allclose(c, c_true, atol=1e-6)


def test_mcep_flat_spectrum_is_pure_gain():
    spec = np.full(129, 3.0)
    c = M.mcep(spec, 12)
    np.testing.assert_allclose(c[0], np.log(3.0), atol=1e-8)
    np.testing.assert_allclose(c[1:], 0.0, atol=1e-8)


def test_code_decode_harmonic_roundtrip():
    rng = np.random.default_rng(1)
    order = 60  # matches decode_harmonic's hardcoded 60-coefficient truncation
    n_freq = M.FFT_SIZE // 2 + 1
    B = M._warp_basis(n_freq, order - 1, M.ALPHA)
    c_true = rng.normal(size=(3, order)) * 0.2 / (1 + np.arange(order))
    sp = np.exp(c_true @ B.T)  # [T=3, n_freq] in-model smooth spectra
    mfsc = M.code_harmonic(sp, order)
    assert mfsc.shape == (3, order)
    back = M.decode_harmonic(mfsc, M.FFT_SIZE)
    assert back.shape == sp.shape
    np.testing.assert_allclose(back, sp, rtol=1e-4, atol=1e-6)


def test_mcep_on_noisy_spectrum_converges_smooth():
    rng = np.random.default_rng(2)
    spec = np.abs(rng.normal(size=257)) + 0.05
    c = M.mcep(spec, 20)
    assert np.all(np.isfinite(c))
    B = M._warp_basis(257, 20, M.ALPHA)
    recon = np.exp(B @ c)
    # envelope lies within the data's dynamic range and is smooth
    assert recon.max() <= spec.max() * 2 and recon.min() >= spec.min() * 0.2
    assert np.abs(np.diff(np.log(recon))).max() < np.abs(np.diff(np.log(spec))).max()


# ------------------------------------------- f0/pitch + length-mask helpers
# (covomix/covomix_model/utils.py:62-145; torch CPU validates the contracts)
from covomix_tpu.util import misc as U  # noqa: E402

HP = {"f0_mean": 120.0, "f0_std": 40.0}


def test_process_f0_standardizes_and_interpolates_unvoiced():
    f0 = np.array([100.0, 0.0, 0.0, 160.0, 0.0, 200.0], np.float32)
    out, uv = U.process_f0(f0, HP)
    np.testing.assert_array_equal(uv, [0, 1, 1, 0, 1, 0])
    # voiced frames: plain standardization
    np.testing.assert_allclose(out[[0, 3, 5]], [(100 - 120) / 40, 1.0, 2.0], atol=1e-6)
    # unvoiced gaps linearly interpolated between voiced neighbors
    np.testing.assert_allclose(out[1], -0.5 + (1.0 - -0.5) / 3, atol=1e-6)
    np.testing.assert_allclose(out[4], 1.5, atol=1e-6)


def test_restore_pitch_roundtrip_uv_and_padding():
    pitch = np.array([-0.5, 1.0, 2.0, -200.0], np.float32)
    uv = np.array([0, 1, 0, 0], np.float32)
    out = U.restore_pitch(pitch, uv, HP)
    np.testing.assert_allclose(out, [100.0, 1.0, 200.0, 0.0], atol=1e-4)
    # clamping applies before the uv/padding overrides (utils.py:91-95)
    out2 = U.restore_pitch(pitch, None, HP, min=110.0, max=150.0)
    np.testing.assert_allclose(out2, [110.0, 150.0, 150.0, 0.0], atol=1e-4)


def test_make_pad_mask_matches_torch_reference_semantics():
    lengths = [3, 1, 2]
    mask = U.make_pad_mask(lengths)
    expect = np.array([[0, 0, 0], [0, 1, 1], [0, 0, 1]], bool)
    np.testing.assert_array_equal(mask, expect)
    np.testing.assert_array_equal(U.make_non_pad_mask(lengths), ~expect)
    np.testing.assert_array_equal(U.get_mask_from_lengths(np.array(lengths)), ~expect)


def test_make_pad_mask_broadcasts_to_xs_along_length_dim():
    lengths = [2, 3]
    xs = np.zeros((2, 4, 3))  # length axis = -1 (size 3)
    m = U.make_pad_mask(lengths, xs)
    assert m.shape == xs.shape
    np.testing.assert_array_equal(m[0, 0], [0, 0, 1])
    np.testing.assert_array_equal(m[1, 2], [0, 0, 0])
    # explicit middle length_dim
    xs2 = np.zeros((2, 3, 5))
    m2 = U.make_pad_mask(lengths, xs2, length_dim=1)
    assert m2.shape == xs2.shape
    np.testing.assert_array_equal(m2[0, :, 0], [0, 0, 1])
    with pytest.raises(ValueError):
        U.make_pad_mask(lengths, xs, length_dim=0)
