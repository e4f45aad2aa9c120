"""Micro-parity tests: JAX layers vs torch primitives under converter layouts.

These pin down the exact weight-layout conventions used by
``models/convert.py`` so that a converted real MASt3R checkpoint reproduces
the reference network's outputs.
"""

import numpy as np
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

from mast3r_slam_tpu.models import layers as L
from mast3r_slam_tpu.models.mast3r import rope_2d

RNG = np.random.default_rng(3)


def t(x):
    return torch.from_numpy(np.asarray(x))


def test_linear_parity():
    w = RNG.normal(size=(6, 4)).astype(np.float32)  # torch (out, in)
    b = RNG.normal(size=6).astype(np.float32)
    x = RNG.normal(size=(2, 5, 4)).astype(np.float32)
    ref = torch.nn.functional.linear(t(x), t(w), t(b)).numpy()
    got = L.linear({"w": jnp.asarray(w.T), "b": jnp.asarray(b)}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-5, atol=1e-5)


def test_layernorm_parity():
    g = RNG.normal(size=8).astype(np.float32)
    b = RNG.normal(size=8).astype(np.float32)
    x = RNG.normal(size=(3, 7, 8)).astype(np.float32)
    ref = torch.nn.functional.layer_norm(t(x), (8,), t(g), t(b), eps=1e-6).numpy()
    got = L.layernorm({"g": jnp.asarray(g), "b": jnp.asarray(b)}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-5, atol=1e-5)


def test_gelu_parity():
    x = RNG.normal(size=(100,)).astype(np.float32) * 3
    ref = torch.nn.functional.gelu(t(x)).numpy()
    np.testing.assert_allclose(np.asarray(L.gelu(jnp.asarray(x))), ref, rtol=1e-5, atol=1e-6)


def test_conv2d_parity():
    w = RNG.normal(size=(5, 3, 3, 3)).astype(np.float32)  # (out, in, kh, kw)
    b = RNG.normal(size=5).astype(np.float32)
    x = RNG.normal(size=(2, 3, 8, 10)).astype(np.float32)  # NCHW
    ref = torch.nn.functional.conv2d(t(x), t(w), t(b), padding=1).numpy()
    got = L.conv2d(
        {"w": jnp.asarray(np.transpose(w, (2, 3, 1, 0))), "b": jnp.asarray(b)},
        jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
        padding="SAME",
    )
    np.testing.assert_allclose(
        np.asarray(got.transpose(0, 3, 1, 2)), ref, rtol=1e-4, atol=1e-4
    )


def test_conv2d_stride2_parity():
    """The DPT act3 downsampler: conv k3 s2 p1."""
    w = RNG.normal(size=(4, 6, 3, 3)).astype(np.float32)
    b = RNG.normal(size=4).astype(np.float32)
    x = RNG.normal(size=(1, 6, 8, 12)).astype(np.float32)
    ref = torch.nn.functional.conv2d(t(x), t(w), t(b), stride=2, padding=1).numpy()
    got = L.conv2d(
        {"w": jnp.asarray(np.transpose(w, (2, 3, 1, 0))), "b": jnp.asarray(b)},
        jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
        stride=2,
        padding=[(1, 1), (1, 1)],
    )
    np.testing.assert_allclose(
        np.asarray(got.transpose(0, 3, 1, 2)), ref, rtol=1e-4, atol=1e-4
    )


@pytest.mark.parametrize("k", [2, 4])
def test_conv_transpose_parity(k):
    """DPT upsamplers: ConvTranspose2d with kernel == stride."""
    cin, cout = 6, 5
    w = RNG.normal(size=(cin, cout, k, k)).astype(np.float32)  # torch layout
    b = RNG.normal(size=cout).astype(np.float32)
    x = RNG.normal(size=(2, cin, 4, 7)).astype(np.float32)
    ref = torch.nn.functional.conv_transpose2d(t(x), t(w), t(b), stride=k).numpy()
    got = L.conv2d_transpose(
        {"w": jnp.asarray(np.transpose(w, (2, 3, 0, 1))), "b": jnp.asarray(b)},
        jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
        stride=k,
    )
    np.testing.assert_allclose(
        np.asarray(got.transpose(0, 3, 1, 2)), ref, rtol=1e-4, atol=1e-4
    )


def test_pixel_shuffle_parity():
    r = 4
    x = RNG.normal(size=(2, 3 * r * r, 5, 6)).astype(np.float32)
    ref = torch.nn.functional.pixel_shuffle(t(x), r).numpy()
    got = L.pixel_shuffle(jnp.asarray(np.transpose(x, (0, 2, 3, 1))), r)
    np.testing.assert_allclose(np.asarray(got.transpose(0, 3, 1, 2)), ref, atol=1e-6)


def test_interpolate_bilinear_parity():
    x = RNG.normal(size=(2, 3, 5, 7)).astype(np.float32)
    ref = torch.nn.functional.interpolate(
        t(x), scale_factor=2, mode="bilinear", align_corners=True
    ).numpy()
    got = L.interpolate_bilinear(
        jnp.asarray(np.transpose(x, (0, 2, 3, 1))), (10, 14), align_corners=True
    )
    np.testing.assert_allclose(
        np.asarray(got.transpose(0, 3, 1, 2)), ref, rtol=1e-4, atol=1e-5
    )


def test_rope2d_parity():
    """Against an independent torch implementation of the 2D RoPE spec
    (y/x split halves, duplicated frequencies, rotate-half pairing)."""
    B, H, N, D = 2, 3, 12, 16
    base = 100.0
    tokens = RNG.normal(size=(B, H, N, D)).astype(np.float32)
    # positions: 3x4 grid
    ys, xs = np.meshgrid(np.arange(3), np.arange(4), indexing="ij")
    pos = np.stack([ys.ravel(), xs.ravel()], -1)[None].repeat(B, 0)

    def torch_rope(tok, pos1d):
        d = tok.shape[-1]  # = D/2
        inv_freq = 1.0 / (base ** (np.arange(0, d, 2, dtype=np.float32) / d))
        freqs = pos1d[:, :, None].astype(np.float32) * inv_freq[None, None]
        freqs = np.concatenate([freqs, freqs], -1)  # (B, N, d)
        cos = np.cos(freqs)[:, None]
        sin = np.sin(freqs)[:, None]
        x1, x2 = tok[..., : d // 2], tok[..., d // 2 :]
        rot = np.concatenate([-x2, x1], -1)
        return tok * cos + rot * sin

    y_half = torch_rope(tokens[..., : D // 2], pos[..., 0])
    x_half = torch_rope(tokens[..., D // 2 :], pos[..., 1])
    ref = np.concatenate([y_half, x_half], -1)

    got = rope_2d(jnp.asarray(tokens), jnp.asarray(pos), base)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-5, atol=1e-5)


def test_encoder_block_full_parity():
    """A full pre-LN self-attention block (qkv-packed, multi-head, RoPE off)
    vs an independent torch implementation, through converted weights."""
    dim, heads, N, B = 16, 2, 6, 2
    mlp_hidden = 32

    class TorchBlock(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.norm1 = torch.nn.LayerNorm(dim, eps=1e-6)
            self.qkv = torch.nn.Linear(dim, dim * 3)
            self.proj = torch.nn.Linear(dim, dim)
            self.norm2 = torch.nn.LayerNorm(dim, eps=1e-6)
            self.fc1 = torch.nn.Linear(dim, mlp_hidden)
            self.fc2 = torch.nn.Linear(mlp_hidden, dim)

        def forward(self, x):
            y = self.norm1(x)
            qkv = self.qkv(y).reshape(B, N, 3, heads, dim // heads)
            q, k, v = qkv.permute(2, 0, 3, 1, 4)  # 3, B, H, N, dh
            att = torch.softmax(
                q @ k.transpose(-2, -1) / (dim // heads) ** 0.5, dim=-1
            )
            y = (att @ v).transpose(1, 2).reshape(B, N, dim)
            x = x + self.proj(y)
            y = self.fc2(torch.nn.functional.gelu(self.fc1(self.norm2(x))))
            return x + y

    torch.manual_seed(0)
    blk = TorchBlock().eval()
    x = RNG.normal(size=(B, N, dim)).astype(np.float32)
    with torch.no_grad():
        ref = blk(t(x)).numpy()

    from mast3r_slam_tpu.models import mast3r as M
    from mast3r_slam_tpu.models.convert import _lin, _ln

    sd = {k: v.numpy() for k, v in blk.state_dict().items()}
    params = {
        "norm1": _ln(sd, "norm1"),
        "attn": {"qkv": _lin(sd, "qkv"), "proj": _lin(sd, "proj")},
        "norm2": _ln(sd, "norm2"),
        "mlp": {"fc1": _lin(sd, "fc1"), "fc2": _lin(sd, "fc2")},
    }
    # zero positions → RoPE is identity, isolating the attention conventions
    pos = jnp.zeros((B, N, 2), jnp.int32)
    got = M.encoder_block(params, jnp.asarray(x), pos, heads, 100.0)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-5, atol=2e-5)
