"""HuBERT tokenizer: parity vs a torch mirror of the fairseq inference path.

The real fairseq fork can't be imported here (no omegaconf), so the test
builds the same ops in plain torch following fairseq/models/wav2vec/wav2vec2.py
and fairseq/models/hubert/hubert.py, loads identical weights into both, and
compares layer-12 features and k-means ids."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

from covomix_tpu.models import hubert as H

CFG = H.HubertConfig(
    conv_layers=((32, 10, 5), (32, 3, 2), (32, 2, 2)),
    encoder_layers=2,
    encoder_embed_dim=32,
    encoder_ffn_dim=64,
    encoder_heads=4,
    conv_pos=16,
    conv_pos_groups=4,
    output_layer=2,
    num_units=11,
)


class TorchMirror(nn.Module):
    """Mirrors the fairseq HuBERT inference path (wav2vec2.py:844-946 conv
    frontend + make_conv_pos; post-LN encoder layers; hubert.py:433-549)."""

    def __init__(self, cfg):
        super().__init__()
        convs = []
        c_in = 1
        for i, (dim, k, s) in enumerate(cfg.conv_layers):
            convs.append(nn.Conv1d(c_in, dim, k, stride=s, bias=False))
            c_in = dim
        self.convs = nn.ModuleList(convs)
        self.group_norm = nn.GroupNorm(cfg.conv_layers[0][0], cfg.conv_layers[0][0])
        self.layer_norm = nn.LayerNorm(cfg.conv_layers[-1][0])
        self.proj = nn.Linear(cfg.conv_layers[-1][0], cfg.encoder_embed_dim)
        self.pos_conv = nn.Conv1d(cfg.encoder_embed_dim, cfg.encoder_embed_dim,
                                  cfg.conv_pos, padding=cfg.conv_pos // 2, groups=cfg.conv_pos_groups)
        self.encoder_ln = nn.LayerNorm(cfg.encoder_embed_dim)
        self.mha = nn.ModuleList([nn.MultiheadAttention(cfg.encoder_embed_dim, cfg.encoder_heads, batch_first=True)
                                  for _ in range(cfg.encoder_layers)])
        self.attn_ln = nn.ModuleList([nn.LayerNorm(cfg.encoder_embed_dim) for _ in range(cfg.encoder_layers)])
        self.fc1 = nn.ModuleList([nn.Linear(cfg.encoder_embed_dim, cfg.encoder_ffn_dim) for _ in range(cfg.encoder_layers)])
        self.fc2 = nn.ModuleList([nn.Linear(cfg.encoder_ffn_dim, cfg.encoder_embed_dim) for _ in range(cfg.encoder_layers)])
        self.final_ln = nn.ModuleList([nn.LayerNorm(cfg.encoder_embed_dim) for _ in range(cfg.encoder_layers)])
        self.cfg = cfg

    def forward(self, wav):
        x = wav.unsqueeze(1)
        for i, c in enumerate(self.convs):
            x = c(x)
            if i == 0:
                x = self.group_norm(x)
            x = F.gelu(x)
        x = x.transpose(1, 2)  # [B, T, C]
        x = self.layer_norm(x)
        x = self.proj(x)
        pos = self.pos_conv(x.transpose(1, 2)).transpose(1, 2)
        if self.cfg.conv_pos % 2 == 0:
            pos = pos[:, :-1]
        x = x + F.gelu(pos)
        x = self.encoder_ln(x)
        for i in range(self.cfg.encoder_layers):
            residual = x
            att, _ = self.mha[i](x, x, x, need_weights=False)
            x = self.attn_ln[i](residual + att)
            residual = x
            x = self.final_ln[i](residual + self.fc2[i](F.gelu(self.fc1[i](x))))
        return x


def _convert_from_torch(m: TorchMirror, cfg):
    def lin(l):
        return {"w": jnp.asarray(l.weight.detach().numpy().T), "b": jnp.asarray(l.bias.detach().numpy())}

    d = cfg.encoder_embed_dim
    p = {
        "conv_layers": [{"w": jnp.asarray(c.weight.detach().numpy().transpose(2, 1, 0))} for c in m.convs],
        "fe_group_norm": {"gamma": jnp.asarray(m.group_norm.weight.detach().numpy()),
                          "beta": jnp.asarray(m.group_norm.bias.detach().numpy())},
        "layer_norm": {"gamma": jnp.asarray(m.layer_norm.weight.detach().numpy()),
                       "beta": jnp.asarray(m.layer_norm.bias.detach().numpy())},
        "post_extract_proj": lin(m.proj),
        "pos_conv": {"w": jnp.asarray(m.pos_conv.weight.detach().numpy().transpose(2, 1, 0)),
                     "b": jnp.asarray(m.pos_conv.bias.detach().numpy())},
        "encoder_layer_norm": {"gamma": jnp.asarray(m.encoder_ln.weight.detach().numpy()),
                               "beta": jnp.asarray(m.encoder_ln.bias.detach().numpy())},
        "layers": [],
        "kmeans": jnp.asarray(np.random.RandomState(9).randn(cfg.num_units, d).astype(np.float32)),
    }
    for i in range(cfg.encoder_layers):
        mha = m.mha[i]
        wq, wk, wv = mha.in_proj_weight.detach().numpy().reshape(3, d, d)
        bq, bk, bv = mha.in_proj_bias.detach().numpy().reshape(3, d)
        p["layers"].append({
            "q": {"w": jnp.asarray(wq.T), "b": jnp.asarray(bq)},
            "k": {"w": jnp.asarray(wk.T), "b": jnp.asarray(bk)},
            "v": {"w": jnp.asarray(wv.T), "b": jnp.asarray(bv)},
            "out": {"w": jnp.asarray(mha.out_proj.weight.detach().numpy().T), "b": jnp.asarray(mha.out_proj.bias.detach().numpy())},
            "attn_ln": {"gamma": jnp.asarray(m.attn_ln[i].weight.detach().numpy()), "beta": jnp.asarray(m.attn_ln[i].bias.detach().numpy())},
            "fc1": lin(m.fc1[i]),
            "fc2": lin(m.fc2[i]),
            "final_ln": {"gamma": jnp.asarray(m.final_ln[i].weight.detach().numpy()), "beta": jnp.asarray(m.final_ln[i].bias.detach().numpy())},
        })
    return p


@pytest.fixture(scope="module")
def mirror_and_params():
    torch.manual_seed(0)
    m = TorchMirror(CFG)
    m.eval()
    return m, _convert_from_torch(m, CFG)


def test_features_parity(mirror_and_params):
    m, params = mirror_and_params
    wav = np.random.RandomState(0).randn(1, 800).astype(np.float32) * 0.1
    with torch.no_grad():
        ref = m(torch.from_numpy(wav)).numpy()
    with jax.default_matmul_precision("highest"):
        mine = np.asarray(jax.jit(lambda p, w: H.extract_features(p, CFG, w))(params, jnp.asarray(wav)))
    assert mine.shape == ref.shape
    np.testing.assert_allclose(mine, ref, atol=2e-4)


def test_kmeans_assign_matches_reference_formula(mirror_and_params):
    _, params = mirror_and_params
    feats = np.random.RandomState(1).randn(7, CFG.encoder_embed_dim).astype(np.float32)
    c = np.asarray(params["kmeans"])
    # ApplyKmeans (dump_km_label.py:37-50)
    dist = (feats**2).sum(1, keepdims=True) - 2 * feats @ c.T + (c**2).sum(1)
    ref = dist.argmin(1)
    with jax.default_matmul_precision("highest"):
        mine = np.asarray(H.kmeans_assign(params, jnp.asarray(feats)))
    np.testing.assert_array_equal(mine, ref)


def test_downsample_rate():
    # full-size config: 320x downsample -> 50 Hz at 16 kHz == 20 ms frames
    full = H.HubertConfig()
    assert full.downsample == 320
    assert H.num_output_frames(full, 16000) == 49  # (~1 frame per 20 ms, VALID conv)


def test_wav2units_chunking(mirror_and_params):
    _, params = mirror_and_params
    wav = np.random.RandomState(2).randn(1500).astype(np.float32) * 0.1
    small = H.HubertConfig(**{**CFG.__dict__, "max_chunk": 700})
    ids_chunked = H.wav2units(params, small, wav)
    assert ids_chunked.ndim == 1 and ids_chunked.dtype == np.int64
    assert (ids_chunked >= 0).all() and (ids_chunked < CFG.num_units).all()


def _load_fairseq_module(relpath, name):
    """Load a standalone module FILE from the fairseq fork without importing
    the fairseq package (whose __init__ chain needs omegaconf/hydra)."""
    import importlib.util

    path = f"/root/reference/fairseq-hubert/{relpath}"
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.skipif(not __import__("os").path.isdir("/root/reference/fairseq-hubert"),
                    reason="fairseq fork not mounted")
def test_pos_conv_weight_norm_dim2_fold_matches_fairseq():
    """fairseq weight-norms pos_conv along dim=2 (wav2vec2.py:939) and trims
    one frame via SamePad for even kernels (same_pad.py). Verify the converter
    fold against torch's remove_weight_norm AND our conv against the real
    SamePad from the fork."""
    from covomix_tpu.checkpoint.torch_convert import _conv1d_wn

    same_pad = _load_fairseq_module("fairseq/modules/same_pad.py", "fs_same_pad")
    d, k, g = 16, 8, 4
    torch.manual_seed(5)
    conv = nn.Conv1d(d, d, k, padding=k // 2, groups=g)
    conv = nn.utils.weight_norm(conv, name="weight", dim=2)
    seq = nn.Sequential(conv, same_pad.SamePad(k), nn.GELU())
    sd = {"encoder.pos_conv.0." + n: t for n, t in conv.state_dict().items()}
    p = _conv1d_wn(sd, "encoder.pos_conv.0", wn_dim=2)

    x = np.random.RandomState(6).randn(1, 20, d).astype(np.float32)
    with torch.no_grad():
        ref = seq(torch.from_numpy(x).transpose(1, 2)).transpose(1, 2).numpy()
    from covomix_tpu.models import layers as L

    with jax.default_matmul_precision("highest"):
        y = L.conv1d({k_: jnp.asarray(v) for k_, v in p.items()}, jnp.asarray(x),
                     padding=k // 2, groups=g)
        # even kernel: drop the trailing frame like SamePad
        mine = np.asarray(jax.nn.gelu(y[:, :-1], approximate=False))
    np.testing.assert_allclose(mine, ref, atol=1e-5)


@pytest.mark.skipif(not __import__("os").path.isdir("/root/reference/fairseq-hubert"),
                    reason="fairseq fork not mounted")
def test_groupnorm_matches_fairseq_fp32_group_norm():
    """Conv-frontend group norm vs the fork's Fp32GroupNorm (wav2vec2.py:864)."""
    fgn = _load_fairseq_module("fairseq/modules/fp32_group_norm.py", "fs_fp32_gn")
    c = 32
    torch.manual_seed(7)
    gn = fgn.Fp32GroupNorm(c, c, affine=True)
    with torch.no_grad():
        gn.weight.uniform_(0.5, 1.5)
        gn.bias.uniform_(-0.2, 0.2)
    x = np.random.RandomState(8).randn(2, c, 25).astype(np.float32)
    with torch.no_grad():
        ref = gn(torch.from_numpy(x)).numpy()
    from covomix_tpu.models import layers as L

    p = {"gamma": jnp.asarray(gn.weight.detach().numpy()), "beta": jnp.asarray(gn.bias.detach().numpy())}
    # ours takes [B, T, C]
    mine = np.asarray(L.groupnorm(p, jnp.asarray(x.transpose(0, 2, 1)), num_groups=c)).transpose(0, 2, 1)
    np.testing.assert_allclose(mine, ref, atol=1e-5)


def test_wav2units_tail_chunk_parity(mirror_and_params):
    """Tail chunks shorter than the bucket are padded + frame-masked; ids
    must equal exact-length extraction of the same chunk (review r3: the
    padded frames are zeroed before the positional conv, which sees the same
    zeros a same-padded exact-length conv would)."""
    _, params = mirror_and_params
    rs = np.random.RandomState(5)
    chunk = rs.randn(473).astype(np.float32) * 0.1
    ids_exact = np.asarray(H.wav2units_jit(params, CFG, jnp.asarray(chunk[None])))[0]
    ids_host = H.wav2units(params, CFG, chunk)
    np.testing.assert_array_equal(ids_host, ids_exact)


def test_wav2units_keeps_short_tail(mirror_and_params):
    """A tail covering the conv receptive field must yield its frames
    (reference chunk loop emits frames for ANY consumable tail,
    hubert_feature_reader.py:57-77; the old guard dropped tails shorter than
    downsample*2)."""
    _, params = mirror_and_params
    rs = np.random.RandomState(6)
    # tiny CFG receptive field = 30 samples; downsample = 20
    small = H.HubertConfig(**{**CFG.__dict__, "max_chunk": 700})
    wav = rs.randn(700 + 35).astype(np.float32) * 0.1   # tail 35 in [30, 40)
    ids = H.wav2units(params, small, wav)
    n_main = H.num_output_frames(small, 700)
    n_tail = H.num_output_frames(small, 35)
    assert n_tail == 1
    assert len(ids) == n_main + n_tail


def test_batched_padded_extraction_equals_per_file(mirror_and_params):
    """Mixed-length rows in one padded batch (padding_mask + valid_samples)
    must produce each row's exact-length ids — the batched extraction CLI's
    contract (review r3: without masked group-norm statistics the padded
    zeros shifted every valid frame's instance-norm stats)."""
    _, params = mirror_and_params
    rs = np.random.RandomState(7)
    lens = [473, 301, 640]
    wavs = [rs.randn(n).astype(np.float32) * 0.1 for n in lens]
    padded = max(lens)
    batch = np.zeros((len(lens), padded), np.float32)
    fv = [H.num_output_frames(CFG, n) for n in lens]
    for i, w in enumerate(wavs):
        batch[i, : len(w)] = w
    mask = np.arange(H.num_output_frames(CFG, padded))[None, :] < np.asarray(fv)[:, None]
    ids = np.asarray(H.wav2units_jit(params, CFG, jnp.asarray(batch),
                                     padding_mask=jnp.asarray(mask),
                                     valid_samples=jnp.asarray(lens, jnp.int32)))
    for i, w in enumerate(wavs):
        exact = np.asarray(H.wav2units_jit(params, CFG, jnp.asarray(w[None])))[0]
        np.testing.assert_array_equal(ids[i, : fv[i]], exact, err_msg=f"row {i}")
