"""CPU-reference throughput probe for the benchmark baseline.

The reference repo (hytae1993/masked-diffusion-model) does not run as checked
in (broken imports, SURVEY.md §0) and publishes no numbers (§6), so the
operative baseline is measured: a PyTorch implementation of the same
per-sampling-step work the reference executes — one diffusers-UNet2DModel-
architecture forward (utils/model.py:24-32 topology: 6 levels,
block_out_channels=(128,128,256,256,512,512), layers_per_block=2, attention
at level 5 down / level 2 up and in the mid block) plus the degrade/update
arithmetic of sampler.py:137-250 — run on CPU (torch in this image is
CPU-only, matching "CPU-reference" in BASELINE.json's north star).

Results are cached to benchmarks/cpu_baseline.json; a handful of steps is
timed and extrapolated to the full 1000-step loop.

This file is a measurement harness, not part of the framework product path.
"""

from __future__ import annotations

import json
import math
import os
import time

BASELINE_PATH = os.path.join(os.path.dirname(__file__), "cpu_baseline.json")


def build_torch_unet(channels=(128, 128, 256, 256, 512, 512), layers_per_block=2,
                     attn_down=(False, False, False, False, True, False),
                     attn_up=(False, True, False, False, False, False),
                     in_ch=3, head_dim=8):
    import torch
    import torch.nn as nn

    class Resnet(nn.Module):
        def __init__(self, cin, cout, temb_dim):
            super().__init__()
            self.n1 = nn.GroupNorm(32, cin)
            self.c1 = nn.Conv2d(cin, cout, 3, padding=1)
            self.t = nn.Linear(temb_dim, cout)
            self.n2 = nn.GroupNorm(32, cout)
            self.c2 = nn.Conv2d(cout, cout, 3, padding=1)
            self.skip = nn.Conv2d(cin, cout, 1) if cin != cout else nn.Identity()
            self.act = nn.SiLU()

        def forward(self, x, temb):
            h = self.c1(self.act(self.n1(x)))
            h = h + self.t(self.act(temb))[:, :, None, None]
            h = self.c2(self.act(self.n2(h)))
            return self.skip(x) + h

    class Attn(nn.Module):
        def __init__(self, c):
            super().__init__()
            self.norm = nn.GroupNorm(32, c)
            self.qkv = nn.Linear(c, 3 * c)
            self.out = nn.Linear(c, c)
            self.heads = max(1, c // head_dim)

        def forward(self, x):
            import torch

            b, c, h, w = x.shape
            y = self.norm(x).reshape(b, c, h * w).transpose(1, 2)
            q, k, v = self.qkv(y).chunk(3, dim=-1)

            def split(t):
                return t.reshape(b, h * w, self.heads, -1).transpose(1, 2)

            q, k, v = split(q), split(k), split(v)
            a = torch.softmax(q @ k.transpose(-1, -2) / math.sqrt(q.shape[-1]), dim=-1)
            y = (a @ v).transpose(1, 2).reshape(b, h * w, c)
            return x + self.out(y).reshape(b, h, w, c).permute(0, 3, 1, 2)

    class UNet(nn.Module):
        def __init__(self):
            super().__init__()
            temb_dim = channels[0] * 4
            self.temb = nn.Sequential(
                nn.Linear(channels[0], temb_dim), nn.SiLU(), nn.Linear(temb_dim, temb_dim)
            )
            self.conv_in = nn.Conv2d(in_ch, channels[0], 3, padding=1)
            self.down = nn.ModuleList()
            self.downsample = nn.ModuleList()
            self.attn_d = nn.ModuleList()
            prev = channels[0]
            for i, c in enumerate(channels):
                blocks = nn.ModuleList()
                attns = nn.ModuleList()
                for _ in range(layers_per_block):
                    blocks.append(Resnet(prev, c, temb_dim))
                    attns.append(Attn(c) if attn_down[i] else nn.Identity())
                    prev = c
                self.down.append(blocks)
                self.attn_d.append(attns)
                self.downsample.append(
                    nn.Conv2d(c, c, 3, stride=2, padding=1)
                    if i != len(channels) - 1 else nn.Identity()
                )
            self.mid1 = Resnet(prev, prev, temb_dim)
            self.mid_attn = Attn(prev)
            self.mid2 = Resnet(prev, prev, temb_dim)
            rev = list(reversed(channels))
            # attn_up is in diffusers up_block_types order: index 0 = deepest
            self.up = nn.ModuleList()
            self.attn_u = nn.ModuleList()
            self.upsample = nn.ModuleList()
            self.skip_ch = []
            for i, c in enumerate(rev):
                blocks = nn.ModuleList()
                attns = nn.ModuleList()
                for j in range(layers_per_block + 1):
                    blocks.append(None)  # filled at runtime by channel bookkeeping
                    attns.append(Attn(c) if attn_up[i] else nn.Identity())
                self.up.append(blocks)
                self.attn_u.append(attns)
                self.upsample.append(
                    nn.Sequential(nn.Upsample(scale_factor=2, mode="nearest"),
                                  nn.Conv2d(c, c, 3, padding=1))
                    if i != len(rev) - 1 else nn.Identity()
                )
            self.norm_out = nn.GroupNorm(32, channels[0])
            self.conv_out = nn.Conv2d(channels[0], in_ch, 3, padding=1)
            self.channels = channels
            self.layers_per_block = layers_per_block
            self._build_up(temb_dim)

        def _build_up(self, temb_dim):
            # mirror skip-stack channel bookkeeping of the UNet
            skips = [self.channels[0]]
            for i, c in enumerate(self.channels):
                for _ in range(self.layers_per_block):
                    skips.append(c)
                if i != len(self.channels) - 1:
                    skips.append(c)
            prev = self.channels[-1]
            rev = list(reversed(self.channels))
            for i, c in enumerate(rev):
                for j in range(self.layers_per_block + 1):
                    s = skips.pop()
                    self.up[i][j] = Resnet(prev + s, c, temb_dim)
                    prev = c

        def forward(self, x, t):
            import torch

            half = self.channels[0] // 2
            freqs = torch.exp(
                -math.log(10000) * torch.arange(half, dtype=torch.float32) / half
            )
            emb = t[:, None].float() * freqs[None]
            temb = self.temb(torch.cat([emb.cos(), emb.sin()], dim=-1))
            h = self.conv_in(x)
            skips = [h]
            for i, blocks in enumerate(self.down):
                for blk, at in zip(blocks, self.attn_d[i]):
                    h = blk(h, temb)
                    if not isinstance(at, torch.nn.Identity):
                        h = at(h)
                    skips.append(h)
                if not isinstance(self.downsample[i], torch.nn.Identity):
                    h = self.downsample[i](h)
                    skips.append(h)
            h = self.mid2(self.mid_attn(self.mid1(h, temb)), temb)
            for i, blocks in enumerate(self.up):
                for blk, at in zip(blocks, self.attn_u[i]):
                    h = blk(torch.cat([h, skips.pop()], dim=1), temb)
                    if not isinstance(at, torch.nn.Identity):
                        h = at(h)
                if not isinstance(self.upsample[i], torch.nn.Identity):
                    h = self.upsample[i](h)
            return self.conv_out(torch.nn.functional.silu(self.norm_out(h)))

    return UNet()


def measure_cpu_reference(
    data_size: int = 64,
    batch: int = 8,
    probe_steps: int = 3,
    full_steps: int = 1000,
    threads: int | None = None,
) -> dict:
    """Time `probe_steps` sampling steps (UNet fwd + degrade/update arithmetic)
    on CPU torch and extrapolate to images/sec over the full loop."""
    import torch

    if threads:
        torch.set_num_threads(threads)
    torch.manual_seed(0)
    model = build_torch_unet(in_ch=3).eval()
    x = torch.randn(batch, 3, data_size, data_size)
    t = torch.full((batch,), 500.0)

    with torch.no_grad():
        model(x, t)  # warmup
        t0 = time.perf_counter()
        for i in range(probe_steps):
            out = model(x, t)
            sample_0 = x + out
            # degrade twice + cold-diffusion update (sampler.py:175-216)
            for _ in range(2):
                u = torch.rand(batch, 1, data_size, data_size)
                m = (u > 0.5).float()
                inv = 1 - m
                mu = (sample_0 * inv).sum(dim=(1, 2, 3), keepdim=True) / inv.sum(
                    dim=(1, 2, 3), keepdim=True
                )
                d = inv * mu + m * sample_0
            x = x + d - d
        elapsed = time.perf_counter() - t0

    per_step = elapsed / probe_steps
    images_per_sec = batch / (per_step * full_steps)
    result = {
        "torch_version": torch.__version__,
        "device": "cpu",
        "data_size": data_size,
        "batch": batch,
        "probe_steps": probe_steps,
        "full_steps": full_steps,
        "sec_per_step": per_step,
        "images_per_sec_1000step": images_per_sec,
        "n_params": sum(p.numel() for p in model.parameters()),
    }
    return result


def get_or_measure_baseline() -> dict:
    if os.path.exists(BASELINE_PATH):
        with open(BASELINE_PATH) as f:
            return json.load(f)
    result = measure_cpu_reference()
    with open(BASELINE_PATH, "w") as f:
        json.dump(result, f, indent=2)
    return result


if __name__ == "__main__":
    print(json.dumps(get_or_measure_baseline(), indent=2))
