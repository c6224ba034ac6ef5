"""Measured PyTorch-CPU baseline.

The reference publishes no throughput numbers (BASELINE.md), so the 5x gate is
against a torch-CPU replica of its flagship CMU-MOSEI model (`Concat_Trans`,
cmu-mosei/run.py:321-339) trained with its loop (AdamW lr=1e-3, grad-clip 1.0,
ZLPR loss).  This file is a fresh re-implementation for measurement — same
math, written against this framework's module layout.
"""

from __future__ import annotations

import math
import time
from typing import Dict

import numpy as np


def build_torch_model(m):
    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    class Block(nn.Module):
        def __init__(self, dim, heads, drop):
            super().__init__()
            self.h = heads
            self.proj = nn.Linear(dim, dim, bias=False)
            self.minus = nn.Linear(2 * dim, dim, bias=False)
            self.norm = nn.LayerNorm(dim)
            self.drop = nn.Dropout(drop)
            self.c = nn.Parameter(torch.zeros(1))

        def forward(self, q, k, v, mask, scores=None):
            B, Lq, D = q.shape
            dh = D // self.h

            def split(x):
                return x.view(B, x.shape[1], self.h, dh).transpose(1, 2)

            qh, kh, vh = split(q), split(k), split(v)
            s = qh @ kh.transpose(-2, -1) / math.sqrt(dh)
            if scores is not None:
                s = s + self.c * scores
            s = s - 1e8 * (1.0 - mask[:, None, None, :])
            ctx = (F.softmax(s, dim=-1) @ vh).transpose(1, 2).reshape(B, Lq, D)
            x = self.drop(self.proj(ctx))
            q = self.drop(self.norm(self.minus(torch.cat([q, x], dim=-1))))
            return q, s

    class Grid(nn.Module):
        def __init__(self):
            super().__init__()
            self.ul = nn.Linear(m.l_dim, m.dim, bias=False)
            self.uv = nn.Linear(m.v_dim, m.dim, bias=False)
            self.ua = nn.Linear(m.a_dim, m.dim, bias=False)
            self.blocks = nn.ModuleList(
                [Block(m.dim, m.n_heads, m.dropout) for _ in range(9 * m.n_layers)])
            self.cls = nn.Linear(m.dim * 6 * m.n_layers, m.n_emotions, bias=False)

        def forward(self, l, v, a, lm, vm, am):
            l, v, a = self.ul(l), self.uv(v), self.ua(a)
            outs = {"l": [], "v": [], "a": []}
            spec = [("l", "l"), ("l", "v"), ("l", "a"),
                    ("v", "v"), ("v", "l"), ("v", "a"),
                    ("a", "a"), ("a", "l"), ("a", "v")]
            src = {"l": l, "v": v, "a": a}
            masks = {"l": lm, "v": vm, "a": am}
            bi = 0
            for qm, km in spec:
                q, s = src[qm], None
                for _ in range(m.n_layers):
                    q, s = self.blocks[bi](q, src[km], src[km], masks[km], s)
                    outs[qm].append(q)
                    bi += 1
            import torch as T
            lc = T.cat(outs["l"], dim=2)
            vc = T.cat(outs["v"], dim=2)
            ac = T.cat(outs["a"], dim=2)
            x = T.cat([lc, ac, vc], dim=1)
            x = T.cat([x.mean(1), x.max(1)[0]], dim=1)
            return self.cls(x)

    class ConcatTrans(nn.Module):
        def __init__(self):
            super().__init__()
            e = m.n_emotions
            self.intensity = Grid()
            self.stimulation = Grid()
            self.trans = nn.Parameter(torch.rand(e, e, e))
            self.norm = nn.LayerNorm(e)
            self.out = nn.Linear(2 * e, e)

        def forward(self, l, v, a, lm, vm, am):
            last = self.intensity(l[:, 0], v[:, 0], a[:, 0], lm[:, 0], vm[:, 0], am[:, 0])
            this = self.stimulation(l[:, 1], v[:, 1], a[:, 1], lm[:, 1], vm[:, 1], am[:, 1])
            fused = torch.einsum("bg,be,geh->bh", this, last, self.trans)
            return self.out(torch.cat([this, self.norm(fused)], dim=1))

    return ConcatTrans()


def torch_zlpr(y_pred, y_true):
    import torch

    y_true = y_true.float()
    flipped = (1 - 2 * y_true) * y_pred
    neg = torch.cat([flipped - y_true * 1e12,
                     torch.zeros_like(y_pred[..., :1])], dim=-1)
    pos = torch.cat([flipped - (1 - y_true) * 1e12,
                     torch.zeros_like(y_pred[..., :1])], dim=-1)
    return torch.logsumexp(neg, -1) + torch.logsumexp(pos, -1)


def measure_torch_cpu(m, batch: Dict[str, np.ndarray], *, train_steps: int = 4,
                      infer_steps: int = 4, warmup: int = 1):
    """Returns (train samples/sec, infer samples/sec) for the torch-CPU replica."""
    import torch
    import torch.nn as nn

    torch.manual_seed(0)
    model = build_torch_model(m)
    opt = torch.optim.AdamW(model.parameters(), lr=1e-3)
    t = {k: torch.tensor(v) for k, v in batch.items()}
    args = (t["l"], t["v"], t["a"], t["l_mask"], t["v_mask"], t["a_mask"])
    label = torch.tensor(batch["label"])
    bsz = batch["label"].shape[0]

    def train_step():
        opt.zero_grad()
        loss = torch_zlpr(model(*args), label).mean()
        loss.backward()
        nn.utils.clip_grad_norm_(model.parameters(), 1.0)
        opt.step()

    for _ in range(warmup):
        train_step()
    # best-of-3 windows: the single shared host core makes one-window
    # baselines swing ~10x (measured 3.4-44 samples/s), which distorts
    # vs_baseline in both directions; best-of is also what the jax side uses
    train_sps = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(train_steps):
            train_step()
        train_sps = max(train_sps, bsz * train_steps / (time.perf_counter() - t0))

    model.eval()
    with torch.no_grad():
        model(*args)
        infer_sps = 0.0
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(infer_steps):
                model(*args)
            infer_sps = max(infer_sps, bsz * infer_steps / (time.perf_counter() - t0))
    return train_sps, infer_sps
