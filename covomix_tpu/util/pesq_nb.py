"""PESQ-nb (ITU-T P.862, narrowband) — pure-numpy implementation.

The reference's headline vocoder metric (hifi-gan/evaluate_metric.py:44-72,
hifi-gan/inference.py:44-80 both call `pesq.pesq(sr, ref, deg, 'nb')`). The
`pesq` wheel wraps the ITU C reference; offline we implement the P.862
perceptual model from the published standard structure:

  1. level alignment     — both signals scaled to a fixed active-band power
  2. IRS-receive filter  — narrowband telephone-handset weighting
  3. time alignment      — envelope cross-correlation (global delay)
  4. perceptual model    — 32 ms Hann frames -> Bark-band powers ->
                           Zwicker loudness (power 0.23, hearing threshold)
  5. disturbance         — masked symmetric + asymmetric loudness differences,
                           L2-over-bands / Lp-over-time aggregation
  6. MOS mapping         — 4.5 - 0.1*D - 0.0309*DA, clamped to [-0.5, 4.5]

Deviations from bit-exact P.862 conformance (documented, not hidden):
  * Bark band edges are computed from the Zwicker analytic warp rather than the
    standard's tabulated 49-band layout (the table is not reproducible
    offline); band widths/centres agree to within a few percent.
  * Time alignment is a single global delay from envelope cross-correlation —
    the standard's iterative utterance splitting is omitted (vocoder
    copy-synthesis, this repo's use case, has zero time warping).
  * The IRS filter is applied in the frequency domain from the published
    breakpoint response.

Consequently scores are "P.862-style", monotone in distortion, with
PESQ(x, x) = 4.5 by construction; they are not guaranteed to match the ITU
binary to <0.1 MOS. Use for relative comparisons (the reference repo's usage).
"""

from __future__ import annotations

import numpy as np

_SR = 8000
_FRAME = 256          # 32 ms @ 8 kHz
_HOP = 128            # 50% overlap
_NFFT = 256
_N_BARK = 42


def _bark(f):
    return 13.0 * np.arctan(0.00076 * f) + 3.5 * np.arctan((f / 7500.0) ** 2)


def _bark_inv(z, lo=0.0, hi=8000.0):
    # monotone bisection inverse of _bark
    z = np.atleast_1d(np.asarray(z, np.float64))
    lo_a = np.full_like(z, lo)
    hi_a = np.full_like(z, hi)
    for _ in range(60):
        mid = 0.5 * (lo_a + hi_a)
        m = _bark(mid) < z
        lo_a = np.where(m, mid, lo_a)
        hi_a = np.where(m, hi_a, mid)
    return 0.5 * (lo_a + hi_a)


def _band_matrix():
    """[n_bark, n_fft_bins] averaging matrix over equal-Bark bands up to 4 kHz."""
    freqs = np.fft.rfftfreq(_NFFT, 1.0 / _SR)
    z_max = _bark(_SR / 2)
    edges_z = np.linspace(0.0, z_max, _N_BARK + 1)
    edges_f = _bark_inv(edges_z)
    mat = np.zeros((_N_BARK, freqs.size))
    for b in range(_N_BARK):
        sel = (freqs >= edges_f[b]) & (freqs < edges_f[b + 1])
        if not sel.any():  # narrow low bands: nearest bin
            sel = np.zeros_like(sel)
            sel[np.argmin(np.abs(freqs - 0.5 * (edges_f[b] + edges_f[b + 1])))] = True
        mat[b, sel] = 1.0 / sel.sum()
    centers = 0.5 * (edges_f[:-1] + edges_f[1:])
    widths_z = np.diff(edges_z)
    return mat, centers, widths_z


_BAND_MAT, _BAND_CENTERS, _BAND_WIDTHS = _band_matrix()

# absolute hearing threshold (Terhardt approximation), as band power floor
_thr_db = (3.64 * (_BAND_CENTERS / 1000.0 + 1e-6) ** -0.8
           - 6.5 * np.exp(-0.6 * (_BAND_CENTERS / 1000.0 - 3.3) ** 2)
           + 1e-3 * (_BAND_CENTERS / 1000.0) ** 4)
_ABS_THRESH = 10.0 ** (np.clip(_thr_db, -20, 120) / 10.0)

# IRS-receive-like weighting (P.862 narrowband telephone band), piecewise dB
_IRS_BREAK_F = np.array([0, 100, 200, 300, 500, 1000, 2000, 3000, 3400, 4000], float)
_IRS_BREAK_DB = np.array([-200, -30, -10, 0, 1, 1, 1, 0, -6, -60], float)


def _irs_filter(x):
    n = int(2 ** np.ceil(np.log2(len(x) + 1)))
    X = np.fft.rfft(x, n)
    f = np.fft.rfftfreq(n, 1.0 / _SR)
    gain_db = np.interp(f, _IRS_BREAK_F, _IRS_BREAK_DB)
    X *= 10.0 ** (gain_db / 20.0)
    return np.fft.irfft(X, n)[: len(x)]


def _level_align(x, target_power=1e7):
    """Scale to fixed power over the 300-3400 Hz active band (P.862 §10.1)."""
    n = int(2 ** np.ceil(np.log2(len(x) + 1)))
    X = np.fft.rfft(x, n)
    f = np.fft.rfftfreq(n, 1.0 / _SR)
    band = (f >= 300) & (f <= 3400)
    Xb = np.where(band, X, 0)
    xb = np.fft.irfft(Xb, n)[: len(x)]
    p = np.mean(xb ** 2) + 1e-20
    return x * np.sqrt(target_power / p)


def _global_delay(ref, deg, max_delay_s=0.5):
    """Envelope cross-correlation delay estimate (P.862 crude align)."""
    def envelope(x):
        nf = (len(x) - _FRAME) // _HOP + 1
        if nf < 1:
            return np.zeros(1)
        idx = np.arange(nf)[:, None] * _HOP + np.arange(_FRAME)[None, :]
        e = np.log10(np.mean(x[idx] ** 2, axis=1) + 1e-10)
        return e - e.mean()

    er, ed = envelope(ref), envelope(deg)
    max_lag = int(max_delay_s * _SR / _HOP)
    n = min(len(er), len(ed))
    if n < 4:
        return 0
    lags = range(-min(max_lag, n - 2), min(max_lag, n - 2) + 1)
    best, best_lag = -np.inf, 0
    for lag in lags:
        if lag >= 0:
            a, b = er[lag:n], ed[: n - lag]
        else:
            a, b = er[: n + lag], ed[-lag:n]
        if len(a) < 4:
            continue
        c = float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))
        if c > best:
            best, best_lag = c, lag
    return best_lag * _HOP


def _bark_powers(x):
    """[n_frames, n_bark] band powers of 32 ms Hann frames."""
    nf = (len(x) - _FRAME) // _HOP + 1
    if nf < 1:
        return np.zeros((0, _N_BARK))
    idx = np.arange(nf)[:, None] * _HOP + np.arange(_FRAME)[None, :]
    frames = x[idx] * np.hanning(_FRAME)[None, :]
    spec = np.abs(np.fft.rfft(frames, _NFFT, axis=1)) ** 2
    return spec @ _BAND_MAT.T


def _loudness(bark_pow):
    """Zwicker loudness (P.862 §10.2.5): S = Sl*(P0/0.5)^g*[((0.5+0.5 P/P0)^g)-1],
    g = 0.23; P0 = absolute threshold per band."""
    g = 0.23
    p0 = _ABS_THRESH[None, :]
    s = ((p0 / 0.5) ** g) * (((0.5 + 0.5 * bark_pow / p0) ** g) - 1.0)
    return np.where(bark_pow > p0, s, 0.0)


def pesq_nb(ref: np.ndarray, deg: np.ndarray, sr: int = 8000) -> float:
    """P.862-style narrowband MOS of `deg` against clean `ref` (both 1-D).

    Signature-compatible with the reference's use of pesq.pesq(sr, ref, deg,
    'nb') modulo argument order; resamples to 8 kHz if needed."""
    ref = np.asarray(ref, np.float64).ravel()
    deg = np.asarray(deg, np.float64).ravel()
    if sr != _SR:
        from covomix_tpu.audio.wav import resample  # lazy; optional path

        ref = resample(ref, sr, _SR)
        deg = resample(deg, sr, _SR)
    n = min(len(ref), len(deg))
    ref, deg = ref[:n], deg[:n]
    if n < 2 * _FRAME:
        raise ValueError("signals too short for PESQ (need >= 64 ms)")

    # 1-2. level align + IRS weighting
    ref = _irs_filter(_level_align(ref))
    deg = _irs_filter(_level_align(deg))

    # 3. global time alignment
    d = _global_delay(ref, deg)
    if d > 0:
        ref, deg = ref[d:], deg[: len(ref) - d]
    elif d < 0:
        deg, ref = deg[-d:], ref[: len(deg) + d]
    n = min(len(ref), len(deg))
    ref, deg = ref[:n], deg[:n]

    # 4. perceptual transform
    pr = _bark_powers(ref)
    pd = _bark_powers(deg)
    if pr.shape[0] == 0:
        raise ValueError("no frames")

    # per-frame gain compensation (partial, like the standard's local scaling):
    # bounded ratio of audible powers stops level wobbles counting as distortion
    audible_r = np.sum(np.where(pr > _ABS_THRESH, pr, 0), axis=1) + 1e5
    audible_d = np.sum(np.where(pd > _ABS_THRESH, pd, 0), axis=1) + 1e5
    gain = np.clip(audible_r / audible_d, 3e-4, 5.0)[:, None]
    pd = pd * gain

    lr = _loudness(pr)
    ld = _loudness(pd)

    # 5. disturbance with masking deadzone m = 0.25*min (P.862 §10.2.6)
    diff = ld - lr
    m = 0.25 * np.minimum(ld, lr)
    disturb = np.sign(diff) * np.maximum(np.abs(diff) - m, 0.0)

    # symmetric: L2 over bands (Bark-width weighted)
    w = _BAND_WIDTHS[None, :]
    d_sym = np.sqrt(np.sum(w * disturb ** 2, axis=1) / np.sum(w))

    # asymmetric: penalize added (code-like) distortion more than omissions
    ratio = ((pd + 50.0) / (pr + 50.0)) ** 1.2
    asym = np.where(ratio < 3.0, 0.0, np.minimum(ratio, 12.0))
    d_asym = np.sum(w * np.abs(disturb) * asym, axis=1) / np.sum(w)

    # weight frames by (loudness+const)^0.04 emphasis, soft silence weighting.
    # No tight per-frame cap (the standard's 45 assumes its Sl calibration);
    # a loose outlier bound + the logistic MOS map below do the compressing.
    frame_e = np.sum(lr, axis=1)
    wt = ((frame_e + 1e2) / 1e2) ** 0.04
    d_sym = np.minimum(d_sym / wt, 1000.0)
    d_asym = np.minimum(d_asym / wt, 1000.0)

    def _lp_time(d, p):
        """L6-over-20-frame-intervals then L2 over intervals (P.862 §10.2.7)."""
        if len(d) == 0:
            return 0.0
        nsplit = max(1, len(d) // 20)
        chunks = np.array_split(d, nsplit)
        l6 = np.array([np.mean(c ** p) ** (1.0 / p) for c in chunks])
        return float(np.sqrt(np.mean(l6 ** 2)))

    D = _lp_time(d_sym, 6.0)
    DA = _lp_time(d_asym, 1.0)

    # 6. MOS mapping. The standard's linear form 4.5 - 0.1*D - 0.0309*DA
    # assumes the ITU loudness calibration (Sl, SPL-referenced thresholds);
    # with the analytic Bark/loudness model above the same linear weights are
    # kept for the sym/asym trade-off but the combined penalty is passed
    # through a monotone logistic recalibration fitted to speech+white-noise
    # anchors (SNR 60/50/40/30/20/10 dB -> MOS ~4.4/4.2/3.8/3.2/2.3/1.5):
    p_raw = 0.1 * D + 0.0309 * DA
    penalty = 5.0 / (1.0 + np.exp(-1.6 * (np.log(p_raw + 1e-9) - 2.7)))
    mos = 4.5 - penalty
    return float(np.clip(mos, -0.5, 4.5))
