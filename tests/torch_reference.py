"""Torch oracle models for golden parity tests.

Fresh implementations of the reference's four model families whose module
attribute names match the reference's state_dict key namespace (so the same
converter that imports real reference `.pt` checkpoints is exercised).
Forward math follows the documented reference semantics (SURVEY §2.2).
"""

import math

import torch
import torch.nn as nn
import torch.nn.functional as F


def mha(q, k, v, mask, scores, n_heads, c):
    b, lq, d = q.shape
    dh = d // n_heads

    def split(x):
        return x.view(b, x.shape[1], n_heads, dh).transpose(1, 2)

    qh, kh, vh = split(q), split(k), split(v)
    s = qh @ kh.transpose(-2, -1) / math.sqrt(dh)
    if scores is not None:
        s = s + c * scores
    if mask is not None:
        s = s - 1e8 * (1.0 - mask[:, None, None, :])
    ctx = (F.softmax(s, dim=-1) @ vh).transpose(1, 2).reshape(b, lq, d)
    return ctx, s


class MinusBlock(nn.Module):
    def __init__(self, dim, n_heads, norm_attr="norm1"):
        super().__init__()
        self.n_heads = n_heads
        self.proj = nn.Linear(dim, dim, bias=False)
        self.minus = nn.Linear(2 * dim, dim, bias=False)
        setattr(self, norm_attr, nn.LayerNorm(dim))
        self._norm_attr = norm_attr
        self.c = nn.Parameter(torch.zeros(1))

    def forward(self, q, k, v, mask, scores=None):
        ctx, s = mha(q, k, v, mask, scores, self.n_heads, self.c)
        x = self.proj(ctx)
        norm = getattr(self, self._norm_attr)
        return norm(self.minus(torch.cat([q, x], dim=-1))), s


class RealformerBlock(nn.Module):
    def __init__(self, dim, n_heads, ffn_mult):
        super().__init__()
        self.n_heads = n_heads
        self.w_qkv = nn.ModuleList([nn.Linear(dim, dim, bias=False)
                                    for _ in range(3)])
        self.proj = nn.Linear(dim, dim, bias=False)
        self.norm1 = nn.LayerNorm(dim)
        self.norm2 = nn.LayerNorm(dim)
        self.ffn = nn.Sequential(nn.Linear(dim, ffn_mult * dim), nn.ReLU(),
                                 nn.Linear(ffn_mult * dim, dim), nn.Dropout(0.0))
        self.a = nn.Parameter(torch.zeros(1))
        self.b = nn.Parameter(torch.zeros(1))
        self.c = nn.Parameter(torch.zeros(1))

    def forward(self, q, k, v, mask, scores=None):
        ctx, s = mha(self.w_qkv[0](q), self.w_qkv[1](k), self.w_qkv[2](v),
                     mask, scores, self.n_heads, self.c)
        q = self.norm1(q + self.a * self.proj(ctx))
        q = self.norm2(q + self.b * self.ffn(q))
        return q, s


STREAM_SPEC = [("l", "l"), ("l", "v"), ("l", "a"),
               ("v", "v"), ("v", "l"), ("v", "a"),
               ("a", "a"), ("a", "l"), ("a", "v")]


def run_streams(blocks, n_layers, l, v, a, lm, vm, am, collect_per_layer):
    src = {"l": l, "v": v, "a": a}
    masks = {"l": lm, "v": vm, "a": am}
    outs = {"l": [], "v": [], "a": []}
    bi = 0
    for qm, km in STREAM_SPEC:
        q, s = src[qm], None
        for _ in range(n_layers):
            q, s = blocks[bi](q, src[km], src[km], masks[km], s)
            bi += 1
            if collect_per_layer:
                outs[qm].append(q)
        if not collect_per_layer:
            outs[qm].append(q)
    lc = torch.cat(outs["l"], dim=2)
    vc = torch.cat(outs["v"], dim=2)
    ac = torch.cat(outs["a"], dim=2)
    x = torch.cat([lc, ac, vc], dim=1)
    return torch.cat([x.mean(1), x.max(1)[0]], dim=1)


class LinearUnify(nn.Module):
    def __init__(self, l_dim, v_dim, a_dim, dim, shared_ln=False):
        super().__init__()
        self.linguistic = nn.Linear(l_dim, dim, bias=False)
        self.visual = nn.Linear(v_dim, dim, bias=False)
        self.acoustic = nn.Linear(a_dim, dim, bias=False)
        if shared_ln:
            self.norm1 = nn.LayerNorm(dim)
        self._shared_ln = shared_ln

    def forward(self, l, v, a):
        l, v, a = self.linguistic(l), self.visual(v), self.acoustic(a)
        if self._shared_ln:
            return self.norm1(l), self.norm1(v), self.norm1(a)
        return l, v, a


class MultiAttn(nn.Module):
    """Reference Multi_ATTN (minus blocks, per-layer collect, classifier)."""

    def __init__(self, m, norm_attr="norm1"):
        super().__init__()
        self.m = m
        self.unify_dimension = LinearUnify(m.l_dim, m.v_dim, m.a_dim, m.dim,
                                           shared_ln=(m.unify == "linear_ln"))
        self.multimodal_blocks = nn.ModuleList(
            [MinusBlock(m.dim, m.n_heads, norm_attr)
             for _ in range(9 * m.n_layers)])
        self.classifier = nn.Linear(m.dim * 6 * m.n_layers, m.n_emotions,
                                    bias=False)

    def forward(self, l, v, a, lm, vm, am):
        l, v, a = self.unify_dimension(l, v, a)
        pooled = run_streams(self.multimodal_blocks, self.m.n_layers,
                             l, v, a, lm, vm, am, collect_per_layer=True)
        return self.classifier(pooled)


class ConcatTrans(nn.Module):
    """cmu-mosei Concat_Trans / Ren-MME Base_model (norm_attr distinguishes)."""

    def __init__(self, m, top_norm="norm1", block_norm="norm1"):
        super().__init__()
        e = m.n_emotions
        self.intensity = MultiAttn(m, block_norm)
        self.stimulation = MultiAttn(m, block_norm)
        self.trans = nn.Parameter(torch.rand(e, e, e))
        setattr(self, top_norm, nn.LayerNorm(e))
        self._top_norm = top_norm
        self.out = nn.Linear(2 * e, e)

    def forward(self, l, v, a, lm, vm, am):
        last = self.intensity(l[:, 0], v[:, 0], a[:, 0], lm[:, 0], vm[:, 0], am[:, 0])
        this = self.stimulation(l[:, 1], v[:, 1], a[:, 1], lm[:, 1], vm[:, 1], am[:, 1])
        rows = [torch.matmul(this[i], torch.matmul(last[i], self.trans)).unsqueeze(0)
                for i in range(this.shape[0])]
        fused = torch.cat(rows, dim=0)
        norm = getattr(self, self._top_norm)
        return self.out(torch.cat([this, norm(fused)], dim=1))


class ConcatLinear(nn.Module):
    def __init__(self, dim, e=9):
        super().__init__()
        self.intensity = nn.Linear(dim, e, bias=False)
        self.stimulation = nn.Linear(dim, e, bias=False)
        self.trans = nn.Parameter(torch.rand(e, e, e))
        self.norm = nn.LayerNorm(e)
        self.out = nn.Linear(2 * e, e)

    def forward(self, feat):
        last = self.intensity(feat[:, 0, :])
        this = self.stimulation(feat[:, 1, :])
        rows = [torch.matmul(this[i], torch.matmul(last[i], self.trans)).unsqueeze(0)
                for i in range(this.shape[0])]
        fused = torch.cat(rows, dim=0)
        return self.out(torch.cat([this, self.norm(fused)], dim=1))


class Conv1dUnify(nn.Module):
    def __init__(self, l_dim, v_dim, a_dim, dim):
        super().__init__()
        self.linguistic = nn.Conv1d(l_dim, dim, 1, bias=False)
        self.visual = nn.Conv1d(v_dim, dim, 1, bias=False)
        self.acoustic = nn.Conv1d(a_dim, dim, 1, bias=False)

    def forward(self, l, v, a):
        f = lambda conv, x: conv(x.transpose(1, 2)).transpose(1, 2)
        return f(self.linguistic, l), f(self.visual, v), f(self.acoustic, a)


class PositionEmbedding(nn.Module):
    def __init__(self, max_len, dim):
        super().__init__()
        self.position_embeddings = nn.Embedding(max_len, dim)
        self.len = max_len

    def forward(self, x):
        ids = torch.arange(self.len)[None, :].repeat(x.shape[0], 1)
        return self.position_embeddings(ids)


class RealformerFeature(nn.Module):
    """realformer Multi_class: final-collect grid -> FC+LN+ReLU feature."""

    def __init__(self, m):
        super().__init__()
        self.m = m
        self.unify_dimension = Conv1dUnify(m.l_dim, m.v_dim, m.a_dim, m.dim)
        self.linguistic_position = PositionEmbedding(m.l_len, m.dim)
        self.visual_position = PositionEmbedding(m.v_len, m.dim)
        self.acoustic_position = PositionEmbedding(m.a_len, m.dim)
        self.multimodal_blocks = nn.ModuleList(
            [RealformerBlock(m.dim, m.n_heads, m.ffn)
             for _ in range(9 * m.n_layers)])
        self.fully_connected = nn.Linear(m.dim * 6, m.dim)
        self.normalization = nn.LayerNorm(m.dim)

    def forward(self, l, v, a, lm, vm, am):
        l, v, a = self.unify_dimension(l, v, a)
        l = l + self.linguistic_position(l)
        v = v + self.visual_position(v)
        a = a + self.acoustic_position(a)
        pooled = run_streams(self.multimodal_blocks, self.m.n_layers,
                             l, v, a, lm, vm, am, collect_per_layer=False)
        return torch.relu(self.normalization(self.fully_connected(pooled)))


class StateTransfer(nn.Module):
    def __init__(self, m):
        super().__init__()
        e = m.n_emotions
        self.feature = RealformerFeature(m)
        self.classifier = nn.Linear(m.dim, 2 * e)
        self.trans = nn.Parameter(torch.rand(e, e))
        self._e = e

    def forward(self, l, v, a, lm, vm, am):
        outs, feats_prev, out_prev = [], None, None
        for t in range(l.shape[1]):
            feat = self.feature(l[:, t], v[:, t], a[:, t],
                                lm[:, t], vm[:, t], am[:, t])
            cls = self.classifier(feat)
            out_t1, feats = cls[:, :self._e], cls[:, self._e:]
            if t != 0:
                alpha = torch.sigmoid(feats + feats_prev)
                out_t0 = torch.tanh(out_prev @ self.trans)
                out_t1 = (1 - alpha) * out_t1 + alpha * out_t0
            outs.append(out_t1.unsqueeze(1))
            feats_prev, out_prev = feats, out_t1
        return torch.cat(outs, dim=1)


class MultiresUnify(nn.Module):
    def __init__(self, m):
        super().__init__()
        dim = m.dim
        d256, d512, d1024 = m.v_dims_multires
        self.linguistic = nn.Conv1d(m.l_dim, dim, 1)
        self.visual_1024 = nn.Conv1d(d1024, dim // 3, 1)
        self.visual_512 = nn.Conv1d(d512, dim // 3, 1)
        self.visual_256 = nn.Conv1d(d256, dim // 3, 1)
        self.acoustic = nn.Conv1d(m.a_dim, dim, 1)

    def forward(self, l, v256, v512, v1024, a):
        f = lambda conv, x: conv(x.transpose(1, 2)).transpose(1, 2)
        v = torch.cat([f(self.visual_256, v256), f(self.visual_512, v512),
                       f(self.visual_1024, v1024)], dim=2)
        return f(self.linguistic, l), v, f(self.acoustic, a)


class RobotMultiClass(nn.Module):
    def __init__(self, m):
        super().__init__()
        self.m = m
        self.unify_dimension = MultiresUnify(m)
        self.linguistic_position = PositionEmbedding(m.l_len, m.dim)
        self.visual_position = PositionEmbedding(m.v_len, m.dim)
        self.acoustic_position = PositionEmbedding(m.a_len, m.dim)
        self.multimodal_blocks = nn.ModuleList(
            [RealformerBlock(m.dim, m.n_heads, m.ffn)
             for _ in range(9 * m.n_layers)])
        # present-but-unused in the reference (FC path commented out)
        self.fully_connected = nn.Linear(m.dim * 6, m.dim)
        self.normalization = nn.LayerNorm(m.dim)
        self.classifier = nn.Linear(m.dim * 6 * m.n_layers, m.n_emotions)

    def forward(self, l, v256, v512, v1024, a, lm, vm, am):
        l, v, a = self.unify_dimension(l, v256, v512, v1024, a)
        l = l + self.linguistic_position(l)
        v = v + self.visual_position(v)
        a = a + self.acoustic_position(a)
        pooled = run_streams(self.multimodal_blocks, self.m.n_layers,
                             l, v, a, lm, vm, am, collect_per_layer=True)
        return self.classifier(pooled)
