"""Independent PyTorch oracle implementing the reference model *math* (SURVEY.md §2
C1-C7) for parity testing. Written from the math spec — einsum-based, structurally
different from both the reference and the JAX implementation.

Math being checked (file:line cite the spec, not copied code):
- RoPE: adjacent-pair rotation in fp32, theta = base^(-2j/d) (modelling/llama.py:54-73)
- attention: GQA SDPA, causal, scale 1/sqrt(head_dim) (modelling/llama.py:93-140)
- block: x + attn(rmsnorm(x)); x + mlp(rmsnorm(x)), eps 1e-5 (modelling/llama.py:155-174)
- SwiGLU: w2(silu(w1 x) * w3 x) (modelling/llama.py:143-152)
- head: output(norm(x)); fp32 CE ignore -100 (modelling/llama.py:216-219)
"""

import math

import torch
import torch.nn.functional as F


@torch.no_grad()
def oracle_forward(weights: dict, cfg: dict, tokens: torch.Tensor, labels=None):
    """weights: JAX-layout numpy arrays converted to torch tensors.

    kernels are [in, out] (JAX layout); layer weights stacked [L, ...].
    cfg: dict(embed_dim, num_layers, head_dim, num_heads, num_kv_heads, rope_base,
    is_llama3_1).
    """
    D = cfg["embed_dim"]
    hd = cfg["head_dim"]
    nh = cfg["num_heads"]
    nkv = cfg["num_kv_heads"]
    L = tokens.shape[1]

    # rope table
    j = torch.arange(0, hd, 2, dtype=torch.float64)
    theta = cfg["rope_base"] ** (-j / hd)
    if cfg.get("is_llama3_1"):
        out = []
        for f in theta:
            wav = 2 * math.pi / f
            if wav < 8192 / 4:
                out.append(f)
            elif wav > 8192 / 1:
                out.append(f / 8)
            else:
                smooth = (8192 / wav - 1) / (4 - 1)
                out.append((1 - smooth) * f / 8 + smooth * f)
        theta = torch.tensor(out, dtype=torch.float64)
    pos = torch.arange(L, dtype=torch.float64)
    ang = pos[:, None] * theta[None, :]
    cos, sin = ang.cos().float(), ang.sin().float()  # [L, hd/2]

    def rope(x):  # x [B, L, H, hd]
        xf = x.float()
        xe, xo = xf[..., 0::2], xf[..., 1::2]
        c = cos[None, :, None, :]
        s = sin[None, :, None, :]
        ye = xe * c - xo * s
        yo = xo * c + xe * s
        return torch.stack([ye, yo], dim=-1).flatten(-2).to(x.dtype)

    def rmsnorm(x, w):
        xf = x.float()
        return (xf * torch.rsqrt(xf.pow(2).mean(-1, keepdim=True) + 1e-5) * w.float()).to(x.dtype)

    x = weights["tok_embeddings/weight"][tokens]

    for li in range(cfg["num_layers"]):
        h = rmsnorm(x, weights["layers/attention_norm/scale"][li])
        q = torch.einsum("bld,dk->blk", h, weights["layers/attention/wq/kernel"][li]).view(-1, L, nh, hd)
        k = torch.einsum("bld,dk->blk", h, weights["layers/attention/wk/kernel"][li]).view(-1, L, nkv, hd)
        v = torch.einsum("bld,dk->blk", h, weights["layers/attention/wv/kernel"][li]).view(-1, L, nkv, hd)
        q, k = rope(q), rope(k)
        attn = F.scaled_dot_product_attention(
            q.transpose(1, 2), k.transpose(1, 2), v.transpose(1, 2), is_causal=True, enable_gqa=True
        ).transpose(1, 2)
        attn = attn.reshape(-1, L, nh * hd)
        x = x + torch.einsum("blk,kd->bld", attn, weights["layers/attention/wo/kernel"][li])

        h = rmsnorm(x, weights["layers/ffn_norm/scale"][li])
        g = torch.einsum("bld,df->blf", h, weights["layers/feed_forward/w1/kernel"][li])
        u = torch.einsum("bld,df->blf", h, weights["layers/feed_forward/w3/kernel"][li])
        x = x + torch.einsum("blf,fd->bld", F.silu(g) * u, weights["layers/feed_forward/w2/kernel"][li])

    x = rmsnorm(x, weights["norm/scale"])
    logits = torch.einsum("bld,dv->blv", x, weights["output/kernel"])
    if labels is not None:
        return F.cross_entropy(logits.view(-1, logits.shape[-1]).float(), labels.view(-1))
    return logits
