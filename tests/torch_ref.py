"""Independent PyTorch mirror of the diffusers UNet2DConditionModel and
AutoencoderKL architectures (the SD 1.x / Tiny-SD subset).

Written FROM THE DIFFUSERS MODEL SPEC — module structure, names, and forward
semantics of ``diffusers.models.unet_2d_condition`` / ``autoencoder_kl`` —
deliberately NOT from sdtpu code, so full-network parity tests compare two
independent derivations of the same architecture (VERDICT round 1, item 1).
The reference implementation being mirrored is the same network the Mojo
reference hand-wires (``/root/reference/diffusion.mojo:150-273``,
``/root/reference/vae.mojo:70-250``).

Module attribute names follow diffusers' state_dict keys exactly
(``down_blocks.0.resnets.0.norm1`` etc.), so ``state_dict()`` feeds
``sdtpu.utils.weights.*_params_from_state_dict`` with no renaming — which is
precisely what makes these tests evidence that REAL checkpoints load
correctly: a wrong key mapping or transposed kernel fails here.
"""

import math

import torch
import torch.nn as nn
import torch.nn.functional as F


# ---------------------------------------------------------------------------
# Shared pieces
# ---------------------------------------------------------------------------


class Timesteps(nn.Module):
    """diffusers ``get_timestep_embedding``: sin‖cos (flipped to cos‖sin for
    SD UNets), exponent -ln(10000) * i / (half - freq_shift)."""

    def __init__(self, num_channels, flip_sin_to_cos=True, freq_shift=0.0):
        super().__init__()
        self.num_channels = num_channels
        self.flip_sin_to_cos = flip_sin_to_cos
        self.freq_shift = freq_shift

    def forward(self, t):
        half = self.num_channels // 2
        exponent = -math.log(10000.0) * torch.arange(half, dtype=torch.float32)
        exponent = exponent / (half - self.freq_shift)
        emb = t.float()[:, None] * exponent.exp()[None, :]
        emb = torch.cat([emb.sin(), emb.cos()], dim=-1)
        if self.flip_sin_to_cos:
            emb = torch.cat([emb[:, half:], emb[:, :half]], dim=-1)
        return emb


class TimestepEmbedding(nn.Module):
    """linear_1 -> SiLU -> linear_2; LCM checkpoints add a bias-free
    cond_proj of the guidance embedding to the input first."""

    def __init__(self, in_channels, time_embed_dim, cond_proj_dim=None):
        super().__init__()
        self.linear_1 = nn.Linear(in_channels, time_embed_dim)
        self.linear_2 = nn.Linear(time_embed_dim, time_embed_dim)
        if cond_proj_dim is not None:
            self.cond_proj = nn.Linear(cond_proj_dim, in_channels, bias=False)

    def forward(self, sample, condition=None):
        if condition is not None:
            sample = sample + self.cond_proj(condition)
        return self.linear_2(F.silu(self.linear_1(sample)))


class ResnetBlock2D(nn.Module):
    """GN -> SiLU -> conv3x3 [-> +time] -> GN -> SiLU -> conv3x3, shortcut
    1x1 iff channels change (diffusers default config, output_scale 1)."""

    def __init__(self, in_ch, out_ch, temb_ch=None, groups=32, eps=1e-5):
        super().__init__()
        self.norm1 = nn.GroupNorm(groups, in_ch, eps=eps)
        self.conv1 = nn.Conv2d(in_ch, out_ch, 3, padding=1)
        if temb_ch:
            self.time_emb_proj = nn.Linear(temb_ch, out_ch)
        self.norm2 = nn.GroupNorm(groups, out_ch, eps=eps)
        self.conv2 = nn.Conv2d(out_ch, out_ch, 3, padding=1)
        if in_ch != out_ch:
            self.conv_shortcut = nn.Conv2d(in_ch, out_ch, 1)

    def forward(self, x, temb=None):
        h = self.conv1(F.silu(self.norm1(x)))
        if temb is not None:
            h = h + self.time_emb_proj(F.silu(temb))[:, :, None, None]
        h = self.conv2(F.silu(self.norm2(h)))
        s = self.conv_shortcut(x) if hasattr(self, "conv_shortcut") else x
        return s + h


class CrossAttention(nn.Module):
    """diffusers ``Attention``: to_q/to_k/to_v (bias-free in SD transformer
    blocks), to_out.0 Linear; softmax(QK^T / sqrt(head_dim)) V."""

    def __init__(self, query_dim, context_dim=None, heads=8, qkv_bias=False):
        super().__init__()
        context_dim = context_dim if context_dim is not None else query_dim
        self.heads = heads
        self.to_q = nn.Linear(query_dim, query_dim, bias=qkv_bias)
        self.to_k = nn.Linear(context_dim, query_dim, bias=qkv_bias)
        self.to_v = nn.Linear(context_dim, query_dim, bias=qkv_bias)
        self.to_out = nn.ModuleList([nn.Linear(query_dim, query_dim)])

    def forward(self, x, context=None):
        ctx = x if context is None else context
        b, lq, d = x.shape
        h = self.heads
        q = self.to_q(x).view(b, lq, h, d // h).transpose(1, 2)
        k = self.to_k(ctx).view(b, ctx.shape[1], h, d // h).transpose(1, 2)
        v = self.to_v(ctx).view(b, ctx.shape[1], h, d // h).transpose(1, 2)
        scale = (d // h) ** -0.5
        attn = torch.softmax(q @ k.transpose(-1, -2) * scale, dim=-1)
        out = (attn @ v).transpose(1, 2).reshape(b, lq, d)
        return self.to_out[0](out)


class GEGLU(nn.Module):
    def __init__(self, dim_in, dim_out):
        super().__init__()
        self.proj = nn.Linear(dim_in, dim_out * 2)

    def forward(self, x):
        hidden, gate = self.proj(x).chunk(2, dim=-1)
        return hidden * F.gelu(gate)  # exact (erf) gelu — diffusers default


class FeedForward(nn.Module):
    def __init__(self, dim, mult=4):
        super().__init__()
        self.net = nn.ModuleList(
            [GEGLU(dim, dim * mult), nn.Identity(), nn.Linear(dim * mult, dim)]
        )

    def forward(self, x):
        for m in self.net:
            x = m(x)
        return x


class BasicTransformerBlock(nn.Module):
    def __init__(self, dim, context_dim, heads):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim)
        self.attn1 = CrossAttention(dim, heads=heads)
        self.norm2 = nn.LayerNorm(dim)
        self.attn2 = CrossAttention(dim, context_dim, heads=heads)
        self.norm3 = nn.LayerNorm(dim)
        self.ff = FeedForward(dim)

    def forward(self, x, context):
        x = x + self.attn1(self.norm1(x))
        x = x + self.attn2(self.norm2(x), context)
        x = x + self.ff(self.norm3(x))
        return x


class Transformer2DModel(nn.Module):
    """GN(eps=1e-6) -> 1x1-conv proj_in -> (B, HW, C) tokens -> blocks ->
    1x1-conv proj_out -> + residual (SD 1.x uses conv projections)."""

    def __init__(self, ch, context_dim, heads, depth=1, groups=32):
        super().__init__()
        self.norm = nn.GroupNorm(groups, ch, eps=1e-6)
        self.proj_in = nn.Conv2d(ch, ch, 1)
        self.transformer_blocks = nn.ModuleList(
            [BasicTransformerBlock(ch, context_dim, heads) for _ in range(depth)]
        )
        self.proj_out = nn.Conv2d(ch, ch, 1)

    def forward(self, x, context):
        b, c, h, w = x.shape
        res = x
        x = self.proj_in(self.norm(x))
        x = x.permute(0, 2, 3, 1).reshape(b, h * w, c)
        for blk in self.transformer_blocks:
            x = blk(x, context)
        x = x.reshape(b, h, w, c).permute(0, 3, 1, 2)
        return self.proj_out(x) + res


class Downsample2D(nn.Module):
    def __init__(self, ch, asymmetric_pad=False):
        super().__init__()
        # UNet: stride-2 pad-1; VAE encoder: pad (0,1),(0,1) applied manually
        self.asymmetric_pad = asymmetric_pad
        self.conv = nn.Conv2d(ch, ch, 3, stride=2, padding=0 if asymmetric_pad else 1)

    def forward(self, x):
        if self.asymmetric_pad:
            x = F.pad(x, (0, 1, 0, 1))
        return self.conv(x)


class Upsample2D(nn.Module):
    def __init__(self, ch):
        super().__init__()
        self.conv = nn.Conv2d(ch, ch, 3, padding=1)

    def forward(self, x):
        return self.conv(F.interpolate(x, scale_factor=2.0, mode="nearest"))


# ---------------------------------------------------------------------------
# UNet2DConditionModel (SD 1.x subset: no class embed, no addition embed)
# ---------------------------------------------------------------------------


class _DownBlock(nn.Module):
    def __init__(self, in_ch, out_ch, temb_ch, *, layers, attention, heads,
                 context_dim, groups, depth, downsample):
        super().__init__()
        self.resnets = nn.ModuleList(
            [
                ResnetBlock2D(in_ch if j == 0 else out_ch, out_ch, temb_ch,
                              groups=groups)
                for j in range(layers)
            ]
        )
        if attention:
            self.attentions = nn.ModuleList(
                [
                    Transformer2DModel(out_ch, context_dim, heads, depth=depth,
                                       groups=groups)
                    for _ in range(layers)
                ]
            )
        if downsample:
            self.downsamplers = nn.ModuleList([Downsample2D(out_ch)])

    def forward(self, x, temb, context, skips):
        for j, res in enumerate(self.resnets):
            x = res(x, temb)
            if hasattr(self, "attentions"):
                x = self.attentions[j](x, context)
            skips.append(x)
        if hasattr(self, "downsamplers"):
            x = self.downsamplers[0](x)
            skips.append(x)
        return x


class _UpBlock(nn.Module):
    def __init__(self, out_ch, temb_ch, *, skip_chs, prev_ch, layers, attention,
                 heads, context_dim, groups, depth, upsample):
        super().__init__()
        resnets = []
        for j in range(layers):
            in_ch = (prev_ch if j == 0 else out_ch) + skip_chs[j]
            resnets.append(ResnetBlock2D(in_ch, out_ch, temb_ch, groups=groups))
        self.resnets = nn.ModuleList(resnets)
        if attention:
            self.attentions = nn.ModuleList(
                [
                    Transformer2DModel(out_ch, context_dim, heads, depth=depth,
                                       groups=groups)
                    for _ in range(layers)
                ]
            )
        if upsample:
            self.upsamplers = nn.ModuleList([Upsample2D(out_ch)])

    def forward(self, x, temb, context, skips):
        for j, res in enumerate(self.resnets):
            x = torch.cat([x, skips.pop()], dim=1)
            x = res(x, temb)
            if hasattr(self, "attentions"):
                x = self.attentions[j](x, context)
        if hasattr(self, "upsamplers"):
            x = self.upsamplers[0](x)
        return x


class _MidBlock(nn.Module):
    def __init__(self, ch, temb_ch, *, heads, context_dim, groups, depth):
        super().__init__()
        self.resnets = nn.ModuleList(
            [
                ResnetBlock2D(ch, ch, temb_ch, groups=groups),
                ResnetBlock2D(ch, ch, temb_ch, groups=groups),
            ]
        )
        self.attentions = nn.ModuleList(
            [Transformer2DModel(ch, context_dim, heads, depth=depth, groups=groups)]
        )

    def forward(self, x, temb, context):
        x = self.resnets[0](x, temb)
        x = self.attentions[0](x, context)
        return self.resnets[1](x, temb)


class RefUNet(nn.Module):
    """Takes an sdtpu ``UNetConfig`` for its *constants only* (channel widths,
    level structure) — the wiring below follows the diffusers spec."""

    def __init__(self, cfg):
        super().__init__()
        chs = cfg.block_out_channels
        temb_ch = chs[0] * cfg.time_embed_dim_mult
        groups = cfg.norm_num_groups
        self.cfg = cfg
        self.conv_in = nn.Conv2d(cfg.in_channels, chs[0], 3, padding=1)
        self.time_proj = Timesteps(chs[0], cfg.flip_sin_to_cos, cfg.freq_shift)
        self.time_embedding = TimestepEmbedding(
            chs[0], temb_ch, cond_proj_dim=cfg.time_cond_proj_dim
        )
        if cfg.addition_embed_dim is not None:
            # SDXL micro-conditioning: pooled text embeds ++ sinusoidal
            # embeddings of the 6 size/crop time ids -> its own MLP
            self.add_time_proj = Timesteps(
                cfg.addition_time_embed_dim, cfg.flip_sin_to_cos,
                cfg.freq_shift,
            )
            self.add_embedding = TimestepEmbedding(
                cfg.addition_embed_dim, temb_ch
            )

        def heads_for(ch):
            return cfg.num_attention_heads if cfg.num_attention_heads > 0 else ch // 64

        # encoder: skip channels pushed conv_in, per-resnet, per-downsample
        skip_chs = [chs[0]]
        blocks = []
        in_ch = chs[0]
        for lvl, ch in enumerate(chs):
            last = lvl == len(chs) - 1
            blocks.append(
                _DownBlock(
                    in_ch, ch, temb_ch,
                    layers=cfg.layers_per_block,
                    attention=cfg.attention_levels[lvl],
                    heads=heads_for(ch), context_dim=cfg.cross_attention_dim,
                    groups=groups,
                    depth=cfg.transformer_layers_per_block[lvl],
                    downsample=not last,
                )
            )
            skip_chs += [ch] * cfg.layers_per_block
            if not last:
                skip_chs.append(ch)
            in_ch = ch
        self.down_blocks = nn.ModuleList(blocks)

        if cfg.mid_block:
            self.mid_block = _MidBlock(
                chs[-1], temb_ch, heads=heads_for(chs[-1]),
                context_dim=cfg.cross_attention_dim, groups=groups,
                depth=cfg.transformer_layers_per_block[-1],
            )

        ups = []
        prev_ch = chs[-1]
        for rev in range(len(chs)):
            lvl = len(chs) - 1 - rev
            ch = chs[lvl]
            n = cfg.layers_per_block + 1
            block_skips = [skip_chs.pop() for _ in range(n)]
            ups.append(
                _UpBlock(
                    ch, temb_ch, skip_chs=block_skips, prev_ch=prev_ch,
                    layers=n, attention=cfg.attention_levels[lvl],
                    heads=heads_for(ch), context_dim=cfg.cross_attention_dim,
                    groups=groups,
                    depth=cfg.transformer_layers_per_block[lvl],
                    upsample=lvl > 0,
                )
            )
            prev_ch = ch
        self.up_blocks = nn.ModuleList(ups)

        self.conv_norm_out = nn.GroupNorm(groups, chs[0], eps=1e-5)
        self.conv_out = nn.Conv2d(chs[0], cfg.out_channels, 3, padding=1)

    def forward(self, latents, timesteps, context, *, text_embeds=None,
                time_ids=None, timestep_cond=None, down_residuals=None,
                mid_residual=None):
        """latents: (B, C, H, W); timesteps: (B,); context: (B, L, D);
        text_embeds (B, P) + time_ids (B, 6) for SDXL micro-conditioning;
        timestep_cond (B, cond_proj_dim) for LCM guidance embedding;
        down_residuals/mid_residual: ControlNet additional residuals, added
        to the saved skips / the mid-block output (the diffusers wiring)."""
        temb = self.time_embedding(self.time_proj(timesteps), timestep_cond)
        if hasattr(self, "add_embedding"):
            b = latents.shape[0]
            tid = self.add_time_proj(time_ids.reshape(-1)).reshape(b, -1)
            temb = temb + self.add_embedding(
                torch.cat([text_embeds, tid], dim=-1)
            )
        x = self.conv_in(latents)
        skips = [x]
        for blk in self.down_blocks:
            x = blk(x, temb, context, skips)
        if down_residuals is not None:
            skips = [s + r for s, r in zip(skips, down_residuals)]
        if hasattr(self, "mid_block"):
            x = self.mid_block(x, temb, context)
        if mid_residual is not None:
            x = x + mid_residual
        for blk in self.up_blocks:
            x = blk(x, temb, context, skips)
        return self.conv_out(F.silu(self.conv_norm_out(x)))


# ---------------------------------------------------------------------------
# ControlNetModel (diffusers controlnet spec: the UNet encoder copy + zero
# convs + the control-image conditioning embedder)
# ---------------------------------------------------------------------------


class ControlNetConditioningEmbedding(nn.Module):
    """conv_in -> SiLU -> [conv -> SiLU]* walking the channel ladder (odd
    blocks stride 2, three pairs = the 8x latent downscale) -> zero conv."""

    def __init__(self, out_ch, cond_ch=3, channels=(16, 32, 96, 256)):
        super().__init__()
        self.conv_in = nn.Conv2d(cond_ch, channels[0], 3, padding=1)
        blocks = []
        for i in range(len(channels) - 1):
            blocks.append(nn.Conv2d(channels[i], channels[i], 3, padding=1))
            blocks.append(
                nn.Conv2d(channels[i], channels[i + 1], 3, padding=1, stride=2)
            )
        self.blocks = nn.ModuleList(blocks)
        self.conv_out = nn.Conv2d(channels[-1], out_ch, 3, padding=1)
        nn.init.zeros_(self.conv_out.weight)
        nn.init.zeros_(self.conv_out.bias)

    def forward(self, x):
        x = F.silu(self.conv_in(x))
        for blk in self.blocks:
            x = F.silu(blk(x))
        return self.conv_out(x)


class RefControlNet(nn.Module):
    """ControlNetModel: the base UNet's encoder + mid block (same cfg), a
    conditioning embedder added to conv_in's output, and one zero conv per
    saved skip (``controlnet_down_blocks``) + one for the mid block."""

    def __init__(self, cfg, cond_channels=(16, 32, 96, 256)):
        super().__init__()
        chs = cfg.block_out_channels
        temb_ch = chs[0] * cfg.time_embed_dim_mult
        groups = cfg.norm_num_groups
        self.cfg = cfg
        self.conv_in = nn.Conv2d(cfg.in_channels, chs[0], 3, padding=1)
        self.time_proj = Timesteps(chs[0], cfg.flip_sin_to_cos, cfg.freq_shift)
        self.time_embedding = TimestepEmbedding(chs[0], temb_ch)
        if cfg.addition_embed_dim is not None:
            # SDXL ControlNets carry the text_time micro-conditioning too
            self.add_time_proj = Timesteps(
                cfg.addition_time_embed_dim, cfg.flip_sin_to_cos,
                cfg.freq_shift,
            )
            self.add_embedding = TimestepEmbedding(
                cfg.addition_embed_dim, temb_ch
            )
        self.controlnet_cond_embedding = ControlNetConditioningEmbedding(
            chs[0], channels=cond_channels
        )

        def heads_for(ch):
            return cfg.num_attention_heads if cfg.num_attention_heads > 0 else ch // 64

        blocks = []
        zero_convs = [nn.Conv2d(chs[0], chs[0], 1)]
        in_ch = chs[0]
        for lvl, ch in enumerate(chs):
            last = lvl == len(chs) - 1
            blocks.append(
                _DownBlock(
                    in_ch, ch, temb_ch,
                    layers=cfg.layers_per_block,
                    attention=cfg.attention_levels[lvl],
                    heads=heads_for(ch), context_dim=cfg.cross_attention_dim,
                    groups=groups,
                    depth=cfg.transformer_layers_per_block[lvl],
                    downsample=not last,
                )
            )
            zero_convs += [
                nn.Conv2d(ch, ch, 1) for _ in range(cfg.layers_per_block)
            ]
            if not last:
                zero_convs.append(nn.Conv2d(ch, ch, 1))
            in_ch = ch
        self.down_blocks = nn.ModuleList(blocks)
        self.controlnet_down_blocks = nn.ModuleList(zero_convs)

        if cfg.mid_block:
            self.mid_block = _MidBlock(
                chs[-1], temb_ch, heads=heads_for(chs[-1]),
                context_dim=cfg.cross_attention_dim, groups=groups,
                depth=cfg.transformer_layers_per_block[-1],
            )
            self.controlnet_mid_block = nn.Conv2d(chs[-1], chs[-1], 1)

        for zc in list(self.controlnet_down_blocks) + (
            [self.controlnet_mid_block] if cfg.mid_block else []
        ):
            nn.init.zeros_(zc.weight)
            nn.init.zeros_(zc.bias)

    def forward(self, latents, timesteps, context, cond, conditioning_scale=1.0,
                *, text_embeds=None, time_ids=None):
        """latents (B, C, H, W); cond (B, 3, 8H, 8W) in [0, 1].  Returns
        (down residual list, mid residual or None)."""
        temb = self.time_embedding(self.time_proj(timesteps))
        if hasattr(self, "add_embedding"):
            b = latents.shape[0]
            tid = self.add_time_proj(time_ids.reshape(-1)).reshape(b, -1)
            temb = temb + self.add_embedding(
                torch.cat([text_embeds, tid], dim=-1)
            )
        x = self.conv_in(latents) + self.controlnet_cond_embedding(cond)
        skips = [x]
        for blk in self.down_blocks:
            x = blk(x, temb, context, skips)
        down = [
            zc(s) * conditioning_scale
            for zc, s in zip(self.controlnet_down_blocks, skips)
        ]
        mid = None
        if hasattr(self, "mid_block"):
            x = self.mid_block(x, temb, context)
            mid = self.controlnet_mid_block(x) * conditioning_scale
        return down, mid


# ---------------------------------------------------------------------------
# AutoencoderKL
# ---------------------------------------------------------------------------


class _VAEAttention(nn.Module):
    """diffusers VAE mid attention (new-style ``Attention``): group_norm +
    single-head to_q/to_k/to_v/to_out over spatial tokens + residual."""

    def __init__(self, ch, groups):
        super().__init__()
        self.group_norm = nn.GroupNorm(groups, ch, eps=1e-6)
        self.to_q = nn.Linear(ch, ch)
        self.to_k = nn.Linear(ch, ch)
        self.to_v = nn.Linear(ch, ch)
        self.to_out = nn.ModuleList([nn.Linear(ch, ch)])

    def forward(self, x):
        b, c, h, w = x.shape
        res = x
        t = self.group_norm(x).permute(0, 2, 3, 1).reshape(b, h * w, c)
        q, k, v = self.to_q(t), self.to_k(t), self.to_v(t)
        attn = torch.softmax(q @ k.transpose(-1, -2) * c**-0.5, dim=-1)
        t = self.to_out[0](attn @ v)
        return t.reshape(b, h, w, c).permute(0, 3, 1, 2) + res


class _VAEMid(nn.Module):
    def __init__(self, ch, groups):
        super().__init__()
        self.resnets = nn.ModuleList(
            [
                ResnetBlock2D(ch, ch, None, groups=groups, eps=1e-6),
                ResnetBlock2D(ch, ch, None, groups=groups, eps=1e-6),
            ]
        )
        self.attentions = nn.ModuleList([_VAEAttention(ch, groups)])

    def forward(self, x):
        x = self.resnets[0](x)
        x = self.attentions[0](x)
        return self.resnets[1](x)


class _VAEDownBlock(nn.Module):
    def __init__(self, in_ch, out_ch, *, layers, groups, downsample):
        super().__init__()
        self.resnets = nn.ModuleList(
            [
                ResnetBlock2D(in_ch if j == 0 else out_ch, out_ch, None,
                              groups=groups, eps=1e-6)
                for j in range(layers)
            ]
        )
        if downsample:
            self.downsamplers = nn.ModuleList(
                [Downsample2D(out_ch, asymmetric_pad=True)]
            )

    def forward(self, x):
        for res in self.resnets:
            x = res(x)
        if hasattr(self, "downsamplers"):
            x = self.downsamplers[0](x)
        return x


class _VAEUpBlock(nn.Module):
    def __init__(self, in_ch, out_ch, *, layers, groups, upsample):
        super().__init__()
        self.resnets = nn.ModuleList(
            [
                ResnetBlock2D(in_ch if j == 0 else out_ch, out_ch, None,
                              groups=groups, eps=1e-6)
                for j in range(layers)
            ]
        )
        if upsample:
            self.upsamplers = nn.ModuleList([Upsample2D(out_ch)])

    def forward(self, x):
        for res in self.resnets:
            x = res(x)
        if hasattr(self, "upsamplers"):
            x = self.upsamplers[0](x)
        return x


class _Encoder(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        chs = cfg.block_out_channels
        g = cfg.norm_num_groups
        self.conv_in = nn.Conv2d(cfg.in_channels, chs[0], 3, padding=1)
        blocks = []
        in_ch = chs[0]
        for lvl, ch in enumerate(chs):
            blocks.append(
                _VAEDownBlock(in_ch, ch, layers=cfg.layers_per_block, groups=g,
                              downsample=lvl < len(chs) - 1)
            )
            in_ch = ch
        self.down_blocks = nn.ModuleList(blocks)
        self.mid_block = _VAEMid(chs[-1], g)
        self.conv_norm_out = nn.GroupNorm(g, chs[-1], eps=1e-6)
        self.conv_out = nn.Conv2d(chs[-1], 2 * cfg.latent_channels, 3, padding=1)

    def forward(self, x):
        x = self.conv_in(x)
        for blk in self.down_blocks:
            x = blk(x)
        x = self.mid_block(x)
        return self.conv_out(F.silu(self.conv_norm_out(x)))


class _Decoder(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        chs = cfg.block_out_channels
        g = cfg.norm_num_groups
        self.conv_in = nn.Conv2d(cfg.latent_channels, chs[-1], 3, padding=1)
        self.mid_block = _VAEMid(chs[-1], g)
        blocks = []
        in_ch = chs[-1]
        for rev, ch in enumerate(reversed(chs)):
            blocks.append(
                _VAEUpBlock(in_ch, ch, layers=cfg.layers_per_block + 1,
                            groups=g, upsample=rev < len(chs) - 1)
            )
            in_ch = ch
        self.up_blocks = nn.ModuleList(blocks)
        self.conv_norm_out = nn.GroupNorm(g, chs[0], eps=1e-6)
        self.conv_out = nn.Conv2d(chs[0], cfg.out_channels, 3, padding=1)

    def forward(self, x):
        x = self.conv_in(x)
        x = self.mid_block(x)
        for blk in self.up_blocks:
            x = blk(x)
        return self.conv_out(F.silu(self.conv_norm_out(x)))


class RefAutoencoderKL(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        z = cfg.latent_channels
        self.encoder = _Encoder(cfg)
        self.decoder = _Decoder(cfg)
        self.quant_conv = nn.Conv2d(2 * z, 2 * z, 1)
        self.post_quant_conv = nn.Conv2d(z, z, 1)

    def encode_moments(self, x):
        return self.quant_conv(self.encoder(x))

    def decode(self, z, scaling_factor):
        return self.decoder(self.post_quant_conv(z / scaling_factor))


# ---------------------------------------------------------------------------
# Helpers shared by the golden tests
# ---------------------------------------------------------------------------


def randomize_(model: nn.Module, seed: int = 0) -> None:
    """Seeded non-degenerate values for EVERY parameter — including norm
    scales/biases, which default to 1/0 and would otherwise mask transposed
    or missing affine mappings."""
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for name, p in model.named_parameters():
            if name.endswith(".weight") and p.ndim == 1:  # norm scales
                p.uniform_(0.7, 1.3, generator=g)
            elif name.endswith(".bias"):
                p.uniform_(-0.3, 0.3, generator=g)
            else:
                p.normal_(0.0, 0.05, generator=g)


def state_dict_numpy(model: nn.Module) -> dict:
    return {k: v.detach().numpy() for k, v in model.state_dict().items()}
