"""Generate golden-activation fixtures for the torch->Flax weight loaders.

Builds tiny (depth-2, width-32) state dicts in the EXACT key/tensor layout
of the public checkpoints our loaders consume — OpenAI CLIP
(``visual.transformer.resblocks.N.attn.in_proj_weight`` etc., the layout of
``clip.load("ViT-B/16")``, reference ``main_unsup.py:237``) and
facebookresearch DINO / GCD ViT (``blocks.N.attn.qkv.weight``, reference
``main_unsup.py:241-255``) — and runs an INDEPENDENT torch implementation
of each network's forward semantics to produce expected encoder outputs.

The torch code here is written from the published architectures (QuickGELU,
pre-norm, packed in_proj, EOT pooling, ...), not shared with the Flax
implementation, so a transposed kernel / swapped key anywhere in
``load_openai_clip_weights`` / ``load_dino_weights`` or a semantic drift in
the Flax towers fails the golden test (``tests/test_golden_weights.py``).

Run from the repo root to (re)generate::

    python tests/golden/make_golden.py
"""

import math
import os

import numpy as np
import torch
import torch.nn.functional as F

OUT_DIR = os.path.dirname(os.path.abspath(__file__))

# tiny configs (must match tests/test_golden_weights.py)
IMG, PATCH, VW, VHEADS, DEPTH = 16, 8, 32, 2, 2
EMBED = 16
VOCAB, CTX, TW, THEADS = 64, 12, 32, 2


def _mha(x, w_in, b_in, w_out, b_out, heads, causal=False):
    """Packed-projection multi-head attention, torch semantics.
    x: [B, L, D]."""
    B, L, D = x.shape
    d = D // heads
    qkv = x @ w_in.T + b_in  # [B, L, 3D]
    q, k, v = qkv.split(D, dim=-1)

    def h(t):
        return t.view(B, L, heads, d).transpose(1, 2)  # [B, H, L, d]

    s = (h(q) @ h(k).transpose(-1, -2)) * (d ** -0.5)
    if causal:
        mask = torch.triu(torch.ones(L, L, dtype=torch.bool), diagonal=1)
        s = s.masked_fill(mask, float("-inf"))
    p = F.softmax(s, dim=-1)
    o = (p @ h(v)).transpose(1, 2).reshape(B, L, D)
    return o @ w_out.T + b_out


def _ln(x, w, b, eps=1e-6):
    # per-model eps: CLIP trains with torch's 1e-5 default, DINO with 1e-6
    # — the Flax towers now mirror each exactly (vit.py ViTConfig.norm_eps)
    return F.layer_norm(x, (x.shape[-1],), w, b, eps)


def _block(x, p, prefix, heads, quick_gelu, causal=False, eps=1e-6):
    y = _ln(x, p[f"{prefix}.ln_1.weight"], p[f"{prefix}.ln_1.bias"], eps)
    x = x + _mha(y, p[f"{prefix}.attn.in_proj_weight"],
                 p[f"{prefix}.attn.in_proj_bias"],
                 p[f"{prefix}.attn.out_proj.weight"],
                 p[f"{prefix}.attn.out_proj.bias"], heads, causal)
    y = _ln(x, p[f"{prefix}.ln_2.weight"], p[f"{prefix}.ln_2.bias"], eps)
    h = y @ p[f"{prefix}.mlp.c_fc.weight"].T + p[f"{prefix}.mlp.c_fc.bias"]
    h = h * torch.sigmoid(1.702 * h) if quick_gelu else F.gelu(h)
    h = h @ p[f"{prefix}.mlp.c_proj.weight"].T + p[f"{prefix}.mlp.c_proj.bias"]
    return x + h


def make_clip():
    g = torch.Generator().manual_seed(0)

    def r(*shape, scale=0.2):
        return torch.randn(*shape, generator=g) * scale

    grid = IMG // PATCH
    seq = grid * grid + 1
    p = {
        "visual.conv1.weight": r(VW, 3, PATCH, PATCH),
        "visual.class_embedding": r(VW),
        "visual.positional_embedding": r(seq, VW),
        "visual.ln_pre.weight": 1.0 + r(VW, scale=0.05),
        "visual.ln_pre.bias": r(VW, scale=0.05),
        "visual.ln_post.weight": 1.0 + r(VW, scale=0.05),
        "visual.ln_post.bias": r(VW, scale=0.05),
        "visual.proj": r(VW, EMBED),
        "token_embedding.weight": r(VOCAB, TW),
        "positional_embedding": r(CTX, TW),
        "ln_final.weight": 1.0 + r(TW, scale=0.05),
        "ln_final.bias": r(TW, scale=0.05),
        "text_projection": r(TW, EMBED),
        "logit_scale": torch.tensor(math.log(1 / 0.07)),
    }
    for i in range(DEPTH):
        for tower, w in (("visual.transformer", VW), ("transformer", TW)):
            pre = f"{tower}.resblocks.{i}"
            p.update({
                f"{pre}.ln_1.weight": 1.0 + r(w, scale=0.05),
                f"{pre}.ln_1.bias": r(w, scale=0.05),
                f"{pre}.ln_2.weight": 1.0 + r(w, scale=0.05),
                f"{pre}.ln_2.bias": r(w, scale=0.05),
                f"{pre}.attn.in_proj_weight": r(3 * w, w),
                f"{pre}.attn.in_proj_bias": r(3 * w, scale=0.05),
                f"{pre}.attn.out_proj.weight": r(w, w),
                f"{pre}.attn.out_proj.bias": r(w, scale=0.05),
                f"{pre}.mlp.c_fc.weight": r(4 * w, w),
                f"{pre}.mlp.c_fc.bias": r(4 * w, scale=0.05),
                f"{pre}.mlp.c_proj.weight": r(w, 4 * w),
                f"{pre}.mlp.c_proj.bias": r(w, scale=0.05),
            })

    images = torch.randn(2, 3, IMG, IMG, generator=g)  # NCHW (torch layout)
    tokens = torch.randint(1, VOCAB, (2, CTX), generator=g)
    tokens[0, -3], tokens[1, -1] = VOCAB - 1, VOCAB - 1  # EOT = max id

    with torch.no_grad():
        # ---- visual tower (OpenAI CLIP forward semantics)
        x = F.conv2d(images, p["visual.conv1.weight"], stride=PATCH)
        x = x.flatten(2).transpose(1, 2)  # [B, L-1, D]
        cls = p["visual.class_embedding"].expand(x.shape[0], 1, -1)
        x = torch.cat([cls, x], dim=1) + p["visual.positional_embedding"]
        x = _ln(x, p["visual.ln_pre.weight"], p["visual.ln_pre.bias"],
                eps=1e-5)
        for i in range(DEPTH):
            x = _block(x, p, f"visual.transformer.resblocks.{i}", VHEADS,
                       eps=1e-5,
                       quick_gelu=True)
        x = _ln(x[:, 0], p["visual.ln_post.weight"],
                p["visual.ln_post.bias"], eps=1e-5)
        image_feats = x @ p["visual.proj"]

        # ---- text tower
        t = p["token_embedding.weight"][tokens] + p["positional_embedding"]
        for i in range(DEPTH):
            t = _block(t, p, f"transformer.resblocks.{i}", THEADS,
                       eps=1e-5,
                       quick_gelu=True, causal=True)
        t = _ln(t, p["ln_final.weight"], p["ln_final.bias"], eps=1e-5)
        eot = tokens.argmax(dim=-1)
        text_feats = t[torch.arange(t.shape[0]), eot] @ p["text_projection"]

    out = {f"sd.{k}": v.numpy() for k, v in p.items()}
    out["images_nhwc"] = images.permute(0, 2, 3, 1).numpy()
    out["tokens"] = tokens.numpy()
    out["expected_image_feats"] = image_feats.numpy()
    out["expected_text_feats"] = text_feats.numpy()
    np.savez(os.path.join(OUT_DIR, "clip_tiny.npz"), **out)
    print("clip_tiny.npz:", image_feats.shape, text_feats.shape)


def make_dino():
    g = torch.Generator().manual_seed(1)

    def r(*shape, scale=0.2):
        return torch.randn(*shape, generator=g) * scale

    grid = IMG // PATCH
    seq = grid * grid + 1
    p = {
        "patch_embed.proj.weight": r(VW, 3, PATCH, PATCH),
        "patch_embed.proj.bias": r(VW, scale=0.05),
        "cls_token": r(1, 1, VW),
        "pos_embed": r(1, seq, VW),
        "norm.weight": 1.0 + r(VW, scale=0.05),
        "norm.bias": r(VW, scale=0.05),
    }
    for i in range(DEPTH):
        pre = f"blocks.{i}"
        p.update({
            f"{pre}.norm1.weight": 1.0 + r(VW, scale=0.05),
            f"{pre}.norm1.bias": r(VW, scale=0.05),
            f"{pre}.norm2.weight": 1.0 + r(VW, scale=0.05),
            f"{pre}.norm2.bias": r(VW, scale=0.05),
            f"{pre}.attn.qkv.weight": r(3 * VW, VW),
            f"{pre}.attn.qkv.bias": r(3 * VW, scale=0.05),
            f"{pre}.attn.proj.weight": r(VW, VW),
            f"{pre}.attn.proj.bias": r(VW, scale=0.05),
            f"{pre}.mlp.fc1.weight": r(4 * VW, VW),
            f"{pre}.mlp.fc1.bias": r(4 * VW, scale=0.05),
            f"{pre}.mlp.fc2.weight": r(VW, 4 * VW),
            f"{pre}.mlp.fc2.bias": r(VW, scale=0.05),
        })

    images = torch.randn(2, 3, IMG, IMG, generator=g)

    with torch.no_grad():
        x = F.conv2d(images, p["patch_embed.proj.weight"],
                     p["patch_embed.proj.bias"], stride=PATCH)
        x = x.flatten(2).transpose(1, 2)
        cls = p["cls_token"].expand(x.shape[0], -1, -1)
        x = torch.cat([cls, x], dim=1) + p["pos_embed"]
        for i in range(DEPTH):
            pre = f"blocks.{i}"
            y = _ln(x, p[f"{pre}.norm1.weight"], p[f"{pre}.norm1.bias"])
            x = x + _mha(y, p[f"{pre}.attn.qkv.weight"],
                         p[f"{pre}.attn.qkv.bias"],
                         p[f"{pre}.attn.proj.weight"],
                         p[f"{pre}.attn.proj.bias"], VHEADS)
            y = _ln(x, p[f"{pre}.norm2.weight"], p[f"{pre}.norm2.bias"])
            h = y @ p[f"{pre}.mlp.fc1.weight"].T + p[f"{pre}.mlp.fc1.bias"]
            h = F.gelu(h)  # exact erf gelu (DINO uses nn.GELU)
            h = h @ p[f"{pre}.mlp.fc2.weight"].T + p[f"{pre}.mlp.fc2.bias"]
            x = x + h
        x = _ln(x, p["norm.weight"], p["norm.bias"])
        feats = x[:, 0]

    out = {f"sd.{k}": v.numpy() for k, v in p.items()}
    out["images_nhwc"] = images.permute(0, 2, 3, 1).numpy()
    out["expected_feats"] = feats.numpy()
    np.savez(os.path.join(OUT_DIR, "dino_tiny.npz"), **out)
    print("dino_tiny.npz:", feats.shape)


if __name__ == "__main__":
    make_clip()
    make_dino()
