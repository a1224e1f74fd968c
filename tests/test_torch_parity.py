"""Numerical parity against a PyTorch reference implementation.

The reference stack is torch/timm; these tests build the exact DeiT
computation in torch (same module naming as timm ViT), push the weights
through ``convert.from_torch_state_dict``, and require the JAX forward to
match the torch forward to float32 tolerance — validating the converter
naming, attention math, LayerNorm epsilon, exact-erf GELU, and the
distillation losses (utils/losses.py:10-65) in one shot.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn

from uvc_tpu.configs import get_config
from uvc_tpu.distill.losses import distillation_loss
from uvc_tpu.models import vit
from uvc_tpu.models.convert import from_torch_state_dict

torch.manual_seed(0)


class TorchBlock(nn.Module):
    """timm ViT block (the reference backbone's block structure:
    model_distilled.py:194-247 minus gating)."""

    def __init__(self, d, h, f):
        super().__init__()
        self.norm1 = nn.LayerNorm(d, eps=1e-6)
        self.attn_qkv = nn.Linear(d, 3 * d)
        self.attn_proj = nn.Linear(d, d)
        self.norm2 = nn.LayerNorm(d, eps=1e-6)
        self.fc1 = nn.Linear(d, f)
        self.fc2 = nn.Linear(f, d)
        self.h = h

    def forward(self, x):
        b, n, d = x.shape
        hs = d // self.h
        z = self.norm1(x)
        qkv = self.attn_qkv(z).reshape(b, n, 3, self.h, hs)
        q, k, v = qkv.permute(2, 0, 3, 1, 4)
        attn = (q @ k.transpose(-2, -1)) * hs ** -0.5
        attn = attn.softmax(dim=-1)
        ctx = (attn @ v).transpose(1, 2).reshape(b, n, d)
        x = x + self.attn_proj(ctx)
        z = self.norm2(x)
        x = x + self.fc2(nn.functional.gelu(self.fc1(z)))
        return x


class TorchDeiT(nn.Module):
    def __init__(self, img=32, p=16, d=32, h=2, depth=2, classes=5):
        super().__init__()
        self.patch = nn.Conv2d(3, d, p, p)
        n = (img // p) ** 2
        self.cls_token = nn.Parameter(torch.randn(1, 1, d) * 0.02)
        self.pos_embed = nn.Parameter(torch.randn(1, n + 1, d) * 0.02)
        self.blocks = nn.ModuleList(
            [TorchBlock(d, h, 4 * d) for _ in range(depth)])
        self.norm = nn.LayerNorm(d, eps=1e-6)
        self.head = nn.Linear(d, classes)

    def forward(self, x):
        b = x.shape[0]
        t = self.patch(x).flatten(2).transpose(1, 2)
        t = torch.cat([self.cls_token.expand(b, -1, -1), t], dim=1)
        t = t + self.pos_embed
        for blk in self.blocks:
            t = blk(t)
        t = self.norm(t)
        return self.head(t[:, 0])

    def timm_state_dict(self):
        """Rename to the timm/DeiT convention the converter expects."""
        sd = {}
        sd["patch_embed.proj.weight"] = self.patch.weight.detach()
        sd["patch_embed.proj.bias"] = self.patch.bias.detach()
        sd["cls_token"] = self.cls_token.detach()
        sd["pos_embed"] = self.pos_embed.detach()
        for i, blk in enumerate(self.blocks):
            pre = f"blocks.{i}"
            sd[f"{pre}.norm1.weight"] = blk.norm1.weight.detach()
            sd[f"{pre}.norm1.bias"] = blk.norm1.bias.detach()
            sd[f"{pre}.attn.qkv.weight"] = blk.attn_qkv.weight.detach()
            sd[f"{pre}.attn.qkv.bias"] = blk.attn_qkv.bias.detach()
            sd[f"{pre}.attn.proj.weight"] = blk.attn_proj.weight.detach()
            sd[f"{pre}.attn.proj.bias"] = blk.attn_proj.bias.detach()
            sd[f"{pre}.norm2.weight"] = blk.norm2.weight.detach()
            sd[f"{pre}.norm2.bias"] = blk.norm2.bias.detach()
            sd[f"{pre}.mlp.fc1.weight"] = blk.fc1.weight.detach()
            sd[f"{pre}.mlp.fc1.bias"] = blk.fc1.bias.detach()
            sd[f"{pre}.mlp.fc2.weight"] = blk.fc2.weight.detach()
            sd[f"{pre}.mlp.fc2.bias"] = blk.fc2.bias.detach()
        sd["norm.weight"] = self.norm.weight.detach()
        sd["norm.bias"] = self.norm.bias.detach()
        sd["head.weight"] = self.head.weight.detach()
        sd["head.bias"] = self.head.bias.detach()
        return sd


def test_deit_forward_matches_torch():
    tm = TorchDeiT().eval()
    cfg = get_config("deit_tiny_patch16_224").replace(
        img_size=32, embed_dim=32, depth=2, num_heads=2, num_classes=5)
    params = from_torch_state_dict(tm.timm_state_dict(), cfg)

    x = np.random.default_rng(0).normal(
        size=(4, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x).permute(0, 3, 1, 2)).numpy()
    out = vit.apply(params, jnp.asarray(x), cfg, train=False,
                    dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out.logits), ref,
                               rtol=1e-4, atol=1e-4)


def test_distillation_loss_matches_torch():
    """utils/losses.py:51-64 semantics: soft KL * T^2 / numel and hard CE
    vs teacher argmax, alpha blend."""
    rng = np.random.default_rng(1)
    s = rng.normal(size=(8, 10)).astype(np.float32)
    t = rng.normal(size=(8, 10)).astype(np.float32)
    base = 1.234
    alpha, tau = 0.5, 3.0

    st, tt = torch.from_numpy(s), torch.from_numpy(t)
    soft_ref = nn.functional.kl_div(
        nn.functional.log_softmax(st / tau, dim=1),
        nn.functional.log_softmax(tt / tau, dim=1),
        reduction="sum", log_target=True) * (tau * tau) / st.numel()
    soft_ref = base * (1 - alpha) + float(soft_ref) * alpha
    ours = distillation_loss(jnp.asarray(base), jnp.asarray(s),
                             jnp.asarray(t), kind="soft", alpha=alpha,
                             tau=tau)
    np.testing.assert_allclose(float(ours), soft_ref, rtol=1e-5)

    hard_ref = nn.functional.cross_entropy(st, tt.argmax(dim=1))
    hard_ref = base * (1 - alpha) + float(hard_ref) * alpha
    ours = distillation_loss(jnp.asarray(base), jnp.asarray(s),
                             jnp.asarray(t), kind="hard", alpha=alpha,
                             tau=tau)
    np.testing.assert_allclose(float(ours), hard_ref, rtol=1e-5)


def test_token_performer_matches_torch():
    """Token_performer forward (T2TViT/models/token_performer.py:31-69):
    positive random features, linear attention, v-residual, 1x MLP."""
    dim, emb = 24, 16
    m = emb // 2

    class TorchPerformer(nn.Module):
        def __init__(self):
            super().__init__()
            self.kqv = nn.Linear(dim, 3 * emb)
            self.proj = nn.Linear(emb, emb)
            self.norm1 = nn.LayerNorm(dim)
            self.norm2 = nn.LayerNorm(emb)
            self.mlp1 = nn.Linear(emb, emb)
            self.mlp2 = nn.Linear(emb, emb)
            self.w = nn.Parameter(torch.randn(m, emb), requires_grad=False)

        def prm_exp(self, x):
            xd = ((x * x).sum(dim=-1, keepdim=True)).repeat(1, 1, m) / 2
            wtx = torch.einsum("bti,mi->btm", x.float(), self.w)
            return torch.exp(wtx - xd) / math.sqrt(m)

        def forward(self, x):
            xn = self.norm1(x)
            k, q, v = torch.split(self.kqv(xn), emb, dim=-1)
            kp, qp = self.prm_exp(k), self.prm_exp(q)
            D = torch.einsum("bti,bi->bt", qp, kp.sum(dim=1)).unsqueeze(2)
            kptv = torch.einsum("bin,bim->bnm", v.float(), kp)
            y = torch.einsum("bti,bni->btn", qp, kptv) / (D + 1e-8)
            y = v + self.proj(y)
            h = self.norm2(y)
            h = self.mlp2(nn.functional.gelu(self.mlp1(h)))
            return y + h

    tm = TorchPerformer().eval()
    from uvc_tpu.models.t2t_vit import apply_performer
    p = {
        "kqv": {"kernel": tm.kqv.weight.detach().numpy().T,
                "bias": tm.kqv.bias.detach().numpy()},
        "proj": {"kernel": tm.proj.weight.detach().numpy().T,
                 "bias": tm.proj.bias.detach().numpy()},
        "norm1": {"scale": tm.norm1.weight.detach().numpy(),
                  "bias": tm.norm1.bias.detach().numpy()},
        "norm2": {"scale": tm.norm2.weight.detach().numpy(),
                  "bias": tm.norm2.bias.detach().numpy()},
        "mlp_fc1": {"kernel": tm.mlp1.weight.detach().numpy().T,
                    "bias": tm.mlp1.bias.detach().numpy()},
        "mlp_fc2": {"kernel": tm.mlp2.weight.detach().numpy().T,
                    "bias": tm.mlp2.bias.detach().numpy()},
        "prm_w": tm.w.detach().numpy(),
    }
    p = jax.tree.map(jnp.asarray, p)
    x = np.random.default_rng(2).normal(size=(2, 9, dim)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x)).numpy()
    out = apply_performer(p, jnp.asarray(x), dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-4)


def test_resnet_bottleneck_matches_torch():
    """PreActBottleneck + weight-standardized conv + GroupNorm
    (modeling_resnet.py:36-92), including the stride-2 projection path
    whose GroupNorm uses groups == channels."""
    cin, cout, cmid, stride = 64, 128, 32, 2

    class TorchStd(nn.Conv2d):
        def forward(self, x):
            w = self.weight
            v, mm = torch.var_mean(w, dim=[1, 2, 3], keepdim=True,
                                   unbiased=False)
            w = (w - mm) / torch.sqrt(v + 1e-5)
            return nn.functional.conv2d(x, w, self.bias, self.stride,
                                        self.padding)

    class TorchUnit(nn.Module):
        def __init__(self):
            super().__init__()
            self.gn1 = nn.GroupNorm(32, cmid, eps=1e-6)
            self.conv1 = TorchStd(cin, cmid, 1, bias=False)
            self.gn2 = nn.GroupNorm(32, cmid, eps=1e-6)
            self.conv2 = TorchStd(cmid, cmid, 3, stride=stride, padding=1,
                                  bias=False)
            self.gn3 = nn.GroupNorm(32, cout, eps=1e-6)
            self.conv3 = TorchStd(cmid, cout, 1, bias=False)
            self.downsample = TorchStd(cin, cout, 1, stride=stride,
                                       bias=False)
            self.gn_proj = nn.GroupNorm(cout, cout)

        def forward(self, x):
            residual = self.gn_proj(self.downsample(x))
            y = torch.relu(self.gn1(self.conv1(x)))
            y = torch.relu(self.gn2(self.conv2(y)))
            y = self.gn3(self.conv3(y))
            return torch.relu(residual + y)

    torch.manual_seed(3)
    tm = TorchUnit().eval()
    for p_ in tm.parameters():
        if p_.dim() >= 2:
            nn.init.normal_(p_, std=0.1)

    from uvc_tpu.models.resnet import apply_bottleneck

    def hwio(w):
        return jnp.asarray(w.detach().numpy().transpose(2, 3, 1, 0))

    p = {
        "conv1": hwio(tm.conv1.weight),
        "gn1": {"scale": jnp.asarray(tm.gn1.weight.detach().numpy()),
                "bias": jnp.asarray(tm.gn1.bias.detach().numpy())},
        "conv2": hwio(tm.conv2.weight),
        "gn2": {"scale": jnp.asarray(tm.gn2.weight.detach().numpy()),
                "bias": jnp.asarray(tm.gn2.bias.detach().numpy())},
        "conv3": hwio(tm.conv3.weight),
        "gn3": {"scale": jnp.asarray(tm.gn3.weight.detach().numpy()),
                "bias": jnp.asarray(tm.gn3.bias.detach().numpy())},
        "conv_proj": hwio(tm.downsample.weight),
        "gn_proj": {"scale": jnp.asarray(tm.gn_proj.weight.detach().numpy()),
                    "bias": jnp.asarray(tm.gn_proj.bias.detach().numpy())},
    }
    x = np.random.default_rng(4).normal(
        size=(2, 16, 16, cin)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x).permute(0, 3, 1, 2)) \
            .permute(0, 2, 3, 1).numpy()
    out = apply_bottleneck(p, jnp.asarray(x), stride=stride)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-4)


def test_unfold_matches_torch_exactly():
    """nn.Unfold parity must be EXACT — the stem soft-splits are pure data
    movement (regression: the conv-patches formulation executed as a bf16
    convolution on TPU, injecting ~1e-2 noise)."""
    from uvc_tpu.models.t2t_vit import _unfold
    x = np.random.default_rng(0).normal(size=(2, 12, 12, 5)) \
        .astype(np.float32)
    for (k, s, p) in ((7, 4, 2), (3, 2, 1)):
        ref = nn.Unfold(kernel_size=(k, k), stride=(s, s),
                        padding=(p, p))(
            torch.from_numpy(x).permute(0, 3, 1, 2)) \
            .transpose(1, 2).numpy()
        ours = np.asarray(_unfold(jnp.asarray(x), k, s, p))
        np.testing.assert_array_equal(ours, ref)


def test_cait_talking_head_matches_torch():
    """Attention_talking_head (cait_models.py:86-127): [H,H] logit mixes
    straddling the softmax."""
    d, h = 16, 2
    hs = d // h

    class TorchTH(nn.Module):
        def __init__(self):
            super().__init__()
            self.qkv = nn.Linear(d, 3 * d)
            self.proj = nn.Linear(d, d)
            self.proj_l = nn.Linear(h, h)
            self.proj_w = nn.Linear(h, h)

        def forward(self, x):
            B, N, C = x.shape
            qkv = self.qkv(x).reshape(B, N, 3, h, hs).permute(2, 0, 3, 1, 4)
            q, k, v = qkv[0] * hs ** -0.5, qkv[1], qkv[2]
            attn = q @ k.transpose(-2, -1)
            attn = self.proj_l(attn.permute(0, 2, 3, 1)).permute(0, 3, 1, 2)
            attn = attn.softmax(dim=-1)
            attn = self.proj_w(attn.permute(0, 2, 3, 1)).permute(0, 3, 1, 2)
            x = (attn @ v).transpose(1, 2).reshape(B, N, C)
            return self.proj(x)

    torch.manual_seed(5)
    tm = TorchTH().eval()
    from uvc_tpu.models.cait import _talking_head_attention
    blk = {
        "qkv": {"kernel": jnp.asarray(tm.qkv.weight.detach().numpy().T),
                "bias": jnp.asarray(tm.qkv.bias.detach().numpy())},
        "proj": {"kernel": jnp.asarray(tm.proj.weight.detach().numpy().T),
                 "bias": jnp.asarray(tm.proj.bias.detach().numpy())},
        "proj_l": {"kernel": jnp.asarray(
            tm.proj_l.weight.detach().numpy().T),
            "bias": jnp.asarray(tm.proj_l.bias.detach().numpy())},
        "proj_w": {"kernel": jnp.asarray(
            tm.proj_w.weight.detach().numpy().T),
            "bias": jnp.asarray(tm.proj_w.bias.detach().numpy())},
    }
    x = np.random.default_rng(6).normal(size=(2, 9, d)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x)).numpy()
    out = _talking_head_attention(jnp.asarray(x), blk, h, hs ** -0.5,
                                  jnp.float32)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-4)
