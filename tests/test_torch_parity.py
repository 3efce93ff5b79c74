"""Cross-framework numerical parity: a torch (CPU) re-statement of the
published SuperPoint forward vs our JAX implementation, with IDENTICAL
synthetic weights flowing through the real conversion path.

This is the fixture VERDICT r1 weak #3 asked for: the goldens pin
refactor drift, but only a torch-side forward proves the *semantics*
(SAME conv padding, max-pool tie-breaking, cell softmax + dustbin,
depth-to-space ordering, NMS, bilinear descriptor sampling) match the
framework the checkpoints were trained in. Runs in fp32 on a small
image; torch is a test-only dependency (importorskip)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from imcui_tpu.models.extractors import superpoint as sp
from imcui_tpu.ops import nms as nms_ops
from imcui_tpu.utils.weights import tree_to_state_dict


def torch_superpoint_dense(sd, img):
    """Published SuperPoint forward (trunk + heads) in torch, from the
    upstream-named state_dict. img: (H, W) f32 → (heat (H, W),
    descmap (Hc, Wc, 256))."""
    import torch.nn.functional as F

    x = torch.from_numpy(img)[None, None]

    def conv(name, x, relu=True):
        w = torch.from_numpy(np.asarray(sd[f"{name}.weight"]))
        b = torch.from_numpy(np.asarray(sd[f"{name}.bias"]))
        y = F.conv2d(x, w, b, padding=w.shape[-1] // 2)
        return F.relu(y) if relu else y

    y = conv("conv1a", x)
    y = conv("conv1b", y)
    y = F.max_pool2d(y, 2, 2)
    y = conv("conv2a", y)
    y = conv("conv2b", y)
    y = F.max_pool2d(y, 2, 2)
    y = conv("conv3a", y)
    y = conv("conv3b", y)
    y = F.max_pool2d(y, 2, 2)
    y = conv("conv4a", y)
    feats = conv("conv4b", y)

    cpa = conv("convPa", feats)
    logits = conv("convPb", cpa, relu=False)
    probs = torch.softmax(logits, 1)[:, :-1]          # drop dustbin
    b, c, hc, wc = probs.shape
    heat = probs.permute(0, 2, 3, 1).reshape(b, hc, wc, 8, 8)
    heat = heat.permute(0, 1, 3, 2, 4).reshape(b, hc * 8, wc * 8)

    cda = conv("convDa", feats)
    desc = conv("convDb", cda, relu=False)
    desc = torch.nn.functional.normalize(desc, p=2, dim=1)
    return (heat[0].numpy(),
            desc[0].permute(1, 2, 0).numpy())          # (Hc, Wc, 256)


@pytest.fixture(scope="module")
def weights_and_image():
    params = sp.init_params(jax.random.PRNGKey(7))
    sd = tree_to_state_dict(params)
    img = np.random.default_rng(0).uniform(
        size=(64, 96)).astype(np.float32)
    return params, sd, img


def test_dense_heads_parity(weights_and_image):
    params, sd, img = weights_and_image
    heat_t, desc_t = torch_superpoint_dense(sd, img)

    x = jnp.asarray(img)[None, :, :, None]
    feats = sp.backbone(params, x)
    heat_j = np.asarray(sp.dense_scores(params, feats))[0]
    desc_j = np.asarray(sp.dense_descriptors(params, feats))[0]

    np.testing.assert_allclose(heat_j, heat_t, atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(desc_j, desc_t, atol=2e-5, rtol=1e-4)


def test_nms_and_topk_parity(weights_and_image):
    """SuperPoint's simple_nms + top-k against the published torch
    reference implementation."""
    _, _, img = weights_and_image
    scores = np.random.default_rng(1).uniform(
        size=(48, 64)).astype(np.float32)

    # published simple_nms (magicleap SuperPointPretrainedNetwork /
    # SuperGlue repo semantics)
    def torch_simple_nms(s, radius):
        import torch.nn.functional as F

        s = torch.from_numpy(s)[None, None]

        def maxpool(t):
            return F.max_pool2d(t, radius * 2 + 1, stride=1,
                                padding=radius)

        zeros = torch.zeros_like(s)
        max_mask = s == maxpool(s)
        for _ in range(2):
            supp_mask = maxpool(max_mask.float()) > 0
            supp_scores = torch.where(supp_mask, zeros, s)
            new_max_mask = supp_scores == maxpool(supp_scores)
            max_mask = max_mask | (new_max_mask & (~supp_mask))
        return torch.where(max_mask, s, zeros)[0, 0].numpy()

    ref = torch_simple_nms(scores, 4)
    got = np.asarray(nms_ops.simple_nms(jnp.asarray(scores), 4))
    np.testing.assert_allclose(got, ref, atol=1e-7)


def test_descriptor_sampling_parity(weights_and_image):
    """Bilinear descriptor sampling at keypoints vs torch grid_sample
    (align_corners=True, the SuperPoint convention)."""
    import torch.nn.functional as F

    rng = np.random.default_rng(2)
    dmap = rng.normal(size=(8, 12, 32)).astype(np.float32)
    dmap /= np.linalg.norm(dmap, axis=-1, keepdims=True)
    kpts = np.stack([rng.uniform(4, 12 * 8 - 5, 10),
                     rng.uniform(4, 8 * 8 - 5, 10)], -1).astype(np.float32)

    got = np.asarray(nms_ops.sample_descriptors(
        jnp.asarray(kpts), jnp.asarray(dmap).transpose(2, 0, 1), s=8))

    d = torch.from_numpy(dmap).permute(2, 0, 1)[None]    # (1, C, Hc, Wc)
    k = torch.from_numpy(kpts) - 8 / 2 + 0.5
    k = k / torch.tensor([12 * 8 - 8 / 2 - 0.5, 8 * 8 - 8 / 2 - 0.5])
    k = k * 2 - 1
    ref = F.grid_sample(d, k[None, None], mode="bilinear",
                        align_corners=True)[0, :, 0]
    ref = F.normalize(ref, p=2, dim=0).numpy()
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-4)


# ---------------------------------------------------------------------------
# LightGlue cross-framework parity: published torch forward vs our JAX
# implementation, identical weights through tree_to_state_dict. Pins the
# semantics the checkpoints were trained with: Fourier-rotary positional
# encoding (interleaved-pair rotate-half), qkv triple-innermost packing,
# bidirectional cross softmax, sigmoid double-softmax assignment with
# dustbins, and mutual-argmax decoding.
# Reference architecture: imcui/hloc/matchers/lightglue.py wraps the
# published ``lightglue`` package; the ops below restate that package's
# forward (LearnableFourierPositionalEncoding / SelfBlock / CrossBlock /
# MatchAssignment) functionally.
# ---------------------------------------------------------------------------


def _t_lin(sd, name, x):
    w = torch.from_numpy(np.asarray(sd[f"{name}.weight"]))
    b = torch.from_numpy(np.asarray(sd[f"{name}.bias"]))
    return x @ w.T + b


def _t_rotate_half(x):
    x = x.unflatten(-1, (-1, 2))
    x1, x2 = x.unbind(dim=-1)
    return torch.stack((-x2, x1), dim=-1).flatten(start_dim=-2)


def _t_ffn(sd, name, x, message):
    h = torch.cat([x, message], -1)
    h = _t_lin(sd, f"{name}.0", h)
    w = torch.from_numpy(np.asarray(sd[f"{name}.1.weight"]))
    b = torch.from_numpy(np.asarray(sd[f"{name}.1.bias"]))
    h = torch.nn.functional.layer_norm(h, h.shape[-1:], w, b)
    h = torch.nn.functional.gelu(h)
    return _t_lin(sd, f"{name}.3", h)


def torch_lightglue(sd, kpts0, kpts1, d0, d1, size_wh, n_layers, heads):
    import torch.nn.functional as F

    kpts0 = torch.from_numpy(kpts0)
    kpts1 = torch.from_numpy(kpts1)
    size = torch.from_numpy(size_wh)

    def norm_kpts(k):
        shift = size / 2
        scale = size.max() / 2
        return (k - shift) / scale

    def posenc(k):
        wr = torch.from_numpy(np.asarray(sd["posenc.Wr.weight"]))
        proj = norm_kpts(k) @ wr.T                       # (N, dh/2)
        cos = torch.cos(proj).repeat_interleave(2, -1)   # (N, dh)
        sin = torch.sin(proj).repeat_interleave(2, -1)
        return cos, sin

    def rot(t, enc):
        cos, sin = enc
        return t * cos + _t_rotate_half(t) * sin

    def attn(q, k, v):
        dh = q.shape[-1]
        logits = torch.einsum("hnd,hmd->hnm", q, k) / dh ** 0.5
        return torch.einsum("hnm,hmd->hnd", logits.softmax(-1), v)

    def heads_split(x):
        n, d = x.shape
        return x.reshape(n, heads, d // heads).permute(1, 0, 2)

    def heads_merge(x):
        h, n, dh = x.shape
        return x.permute(1, 0, 2).reshape(n, h * dh)

    x0 = _t_lin(sd, "input_proj", torch.from_numpy(d0))
    x1 = _t_lin(sd, "input_proj", torch.from_numpy(d1))
    enc0, enc1 = posenc(kpts0), posenc(kpts1)

    for i in range(n_layers):
        for x, enc, which in ((x0, enc0, 0), (x1, enc1, 1)):
            nm = f"transformers.{i}.self_attn"
            qkv = _t_lin(sd, f"{nm}.Wqkv", x)
            n, d3 = qkv.shape
            d = d3 // 3
            qkv = qkv.unflatten(-1, (heads, d // heads, 3))  # (N,H,dh,3)
            q = rot(qkv[..., 0].permute(1, 0, 2), enc)
            k = rot(qkv[..., 1].permute(1, 0, 2), enc)
            v = qkv[..., 2].permute(1, 0, 2)
            message = _t_lin(sd, f"{nm}.out_proj", heads_merge(attn(q, k, v)))
            out = x + _t_ffn(sd, f"{nm}.ffn", x, message)
            if which == 0:
                x0 = out
            else:
                x1 = out
        nm = f"transformers.{i}.cross_attn"
        qk0 = heads_split(_t_lin(sd, f"{nm}.to_qk", x0))
        qk1 = heads_split(_t_lin(sd, f"{nm}.to_qk", x1))
        v0 = heads_split(_t_lin(sd, f"{nm}.to_v", x0))
        v1 = heads_split(_t_lin(sd, f"{nm}.to_v", x1))
        dh = qk0.shape[-1]
        sim = torch.einsum("hid,hjd->hij", qk0, qk1) / dh ** 0.5
        m0 = torch.einsum("hij,hjd->hid", sim.softmax(-1), v1)
        m1 = torch.einsum("hji,hjd->hid",
                          sim.transpose(-2, -1).softmax(-1).transpose(-2, -1),
                          v0)
        m0 = _t_lin(sd, f"{nm}.to_out", heads_merge(m0))
        m1 = _t_lin(sd, f"{nm}.to_out", heads_merge(m1))
        x0 = x0 + _t_ffn(sd, f"{nm}.ffn", x0, m0)
        x1 = x1 + _t_ffn(sd, f"{nm}.ffn", x1, m1)

    d = x0.shape[-1]
    md0 = _t_lin(sd, "log_assignment.1.final_proj", x0) / d ** 0.25
    md1 = _t_lin(sd, "log_assignment.1.final_proj", x1) / d ** 0.25
    sim = torch.einsum("md,nd->mn", md0, md1)
    z0 = _t_lin(sd, "log_assignment.1.matchability", x0)[:, 0]
    z1 = _t_lin(sd, "log_assignment.1.matchability", x1)[:, 0]
    cert = F.logsigmoid(z0)[:, None] + F.logsigmoid(z1)[None, :]
    scores0 = F.log_softmax(sim, 1)
    scores1 = F.log_softmax(sim.transpose(0, 1).contiguous(), 1).transpose(0, 1)
    m, n = sim.shape
    scores = sim.new_full((m + 1, n + 1), 0.0)
    scores[:m, :n] = scores0 + scores1 + cert
    scores[:-1, -1] = F.logsigmoid(-z0)
    scores[-1, :-1] = F.logsigmoid(-z1)

    probs = scores[:-1, :-1].exp()
    idx0 = probs.argmax(1)
    idx1 = probs.argmax(0)
    mutual = torch.arange(m) == idx1.gather(0, idx0)
    mscores = probs.max(1).values
    valid = mutual & (mscores > 0.1)
    matches0 = torch.where(valid, idx0, torch.full_like(idx0, -1))
    return (np.asarray(scores), np.asarray(matches0),
            np.asarray(torch.where(valid, mscores,
                                   torch.zeros_like(mscores))))


def test_lightglue_forward_parity():
    from imcui_tpu.models.matchers import lightglue as lg

    conf = {"features": "custom", "descriptor_dim": 64, "num_heads": 4,
            "n_layers": 2, "add_scale_ori": False, "match_threshold": 0.1,
            "precision": "fp32"}
    params = lg.init_params(jax.random.PRNGKey(11), conf)
    sd = tree_to_state_dict(params)

    rng = np.random.default_rng(3)
    n0, n1 = 12, 10
    kpts0 = rng.uniform(0, 96, (n0, 2)).astype(np.float32)
    kpts1 = rng.uniform(0, 96, (n1, 2)).astype(np.float32)
    d0 = rng.normal(size=(n0, 64)).astype(np.float32)
    d1 = rng.normal(size=(n1, 64)).astype(np.float32)
    size = np.asarray([96.0, 80.0], np.float32)

    scores_t, matches_t, mscores_t = torch_lightglue(
        sd, kpts0, kpts1, d0, d1, size, n_layers=2, heads=4)

    out = lg.forward_pair(
        params, jnp.asarray(kpts0), jnp.asarray(kpts1),
        jnp.asarray(d0), jnp.asarray(d1),
        jnp.ones(n0, bool), jnp.ones(n1, bool),
        jnp.asarray(size), jnp.asarray(size), conf=conf)

    np.testing.assert_array_equal(np.asarray(out["matches0"]), matches_t)
    np.testing.assert_allclose(np.asarray(out["matching_scores0"]),
                               mscores_t, atol=2e-5, rtol=1e-4)


# ---------------------------------------------------------------------------
# SuperGlue cross-framework parity: published torch forward (magicleap
# SuperGlue semantics — keypoint-encoder MLP of 1x1 convs with BN,
# alternating self/cross attentional GNN, log-domain Sinkhorn with
# dustbins, mutual-max decoding) vs our JAX implementation with
# identical weights. Reference wrapper: imcui/hloc/matchers/superglue.py.
# ---------------------------------------------------------------------------


def _sg_mlp(sd, name, x, n_conv):
    """x: (C, N). Convs at sequential indices 0,3,6,... BN at 1,4,...;
    the last conv has no BN/ReLU."""
    import torch.nn.functional as F

    idx = 0
    for i in range(n_conv):
        w = torch.from_numpy(np.asarray(
            sd[f"{name}.{idx}.weight"]))[:, :, None]
        b = torch.from_numpy(np.asarray(sd[f"{name}.{idx}.bias"]))
        x = F.conv1d(x[None], w, b)[0]
        idx += 1
        if i < n_conv - 1:
            g = torch.from_numpy(np.asarray(sd[f"{name}.{idx}.weight"]))
            be = torch.from_numpy(np.asarray(sd[f"{name}.{idx}.bias"]))
            mu = torch.from_numpy(np.asarray(
                sd[f"{name}.{idx}.running_mean"]))
            var = torch.from_numpy(np.asarray(
                sd[f"{name}.{idx}.running_var"]))
            x = (x - mu[:, None]) / torch.sqrt(var[:, None] + 1e-5)
            x = x * g[:, None] + be[:, None]
            x = F.relu(x)
            idx += 2
    return x


def torch_superglue(sd_flat, kpts0, kpts1, sc0, sc1, d0, d1, size_wh,
                    gnn_layers, heads, sinkhorn_iters, threshold):
    import torch.nn.functional as F

    def lin(name, x):
        w = torch.from_numpy(np.asarray(sd_flat[f"{name}.weight"]))
        b = torch.from_numpy(np.asarray(sd_flat[f"{name}.bias"]))
        return (x.T @ w.T + b).T                      # x: (C, N)

    size = torch.from_numpy(size_wh)

    def norm_kpts(k):
        center = size / 2
        scaling = size.max() * 0.7
        return (torch.from_numpy(k) - center) / scaling

    def kenc(kpts, scores):
        inp = torch.cat([norm_kpts(kpts),
                         torch.from_numpy(scores)[:, None]], -1).T  # (3, N)
        return _sg_mlp(sd_flat, "kenc.encoder", inp, 5)

    x0 = torch.from_numpy(d0).T + kenc(kpts0, sc0)     # (256, N)
    x1 = torch.from_numpy(d1).T + kenc(kpts1, sc1)

    def attn(layer, x, source):
        d = x.shape[0]
        dh = d // heads
        q = lin(f"{layer}.attn.proj.0", x).T.reshape(-1, heads, dh)
        k = lin(f"{layer}.attn.proj.1", source).T.reshape(-1, heads, dh)
        v = lin(f"{layer}.attn.proj.2", source).T.reshape(-1, heads, dh)
        logits = torch.einsum("nhd,mhd->hnm", q, k) / dh ** 0.5
        msg = torch.einsum("hnm,mhd->nhd", logits.softmax(-1), v)
        msg = lin(f"{layer}.attn.merge", msg.reshape(-1, heads * dh).T)
        return _sg_mlp(sd_flat, f"{layer}.mlp",
                       torch.cat([x, msg], 0), 2)

    for i in range(gnn_layers):
        nm = f"gnn.layers.{i}"
        if i % 2 == 0:
            d0_, d1_ = attn(nm, x0, x0), attn(nm, x1, x1)
        else:
            d0_, d1_ = attn(nm, x0, x1), attn(nm, x1, x0)
        x0, x1 = x0 + d0_, x1 + d1_

    m0 = lin("final_proj", x0).T                       # (N, 256)
    m1 = lin("final_proj", x1).T
    d = m0.shape[-1]
    scores = torch.einsum("nd,md->nm", m0, m1) / d ** 0.5

    # published log_optimal_transport
    alpha = torch.from_numpy(np.asarray(sd_flat["bin_score"]).reshape(()))
    m, n = scores.shape
    ms, ns = torch.tensor(float(m)), torch.tensor(float(n))
    couplings = torch.cat([
        torch.cat([scores, alpha.expand(m, 1)], -1),
        torch.cat([alpha.expand(1, n), alpha.expand(1, 1)], -1)], 0)
    norm = -(ms + ns).log()
    log_mu = torch.cat([norm.expand(m), ns.log()[None] + norm])
    log_nu = torch.cat([norm.expand(n), ms.log()[None] + norm])
    u, v = torch.zeros_like(log_mu), torch.zeros_like(log_nu)
    for _ in range(sinkhorn_iters):
        u = log_mu - torch.logsumexp(couplings + v[None, :], dim=1)
        v = log_nu - torch.logsumexp(couplings + u[:, None], dim=0)
    Z = couplings + u[:, None] + v[None, :] - norm

    probs = Z[:-1, :-1].exp()
    idx0 = Z[:-1, :-1].max(1).indices
    idx1 = Z[:-1, :-1].max(0).indices
    mutual = torch.arange(m) == idx1.gather(0, idx0)
    mscores = torch.where(mutual, probs.max(1).values,
                          torch.zeros(m))
    valid = mutual & (mscores > threshold)
    matches0 = torch.where(valid, idx0, torch.full_like(idx0, -1))
    return np.asarray(matches0), np.asarray(
        torch.where(valid, mscores, torch.zeros(m)))


def test_superglue_forward_parity():
    from imcui_tpu.models.matchers import superglue as sg

    conf = {"descriptor_dim": 256, "num_heads": 4, "gnn_layers": 4,
            "sinkhorn_iterations": 20, "match_threshold": 0.2,
            "weights": "outdoor"}
    params = sg.init_params(jax.random.PRNGKey(21), conf)
    sd = tree_to_state_dict(params)

    rng = np.random.default_rng(5)
    n0, n1 = 14, 11
    kpts0 = rng.uniform(0, 96, (n0, 2)).astype(np.float32)
    kpts1 = rng.uniform(0, 96, (n1, 2)).astype(np.float32)
    sc0 = rng.uniform(0, 1, n0).astype(np.float32)
    sc1 = rng.uniform(0, 1, n1).astype(np.float32)
    d0 = rng.normal(size=(n0, 256)).astype(np.float32)
    d1 = rng.normal(size=(n1, 256)).astype(np.float32)
    size = np.asarray([96.0, 80.0], np.float32)

    matches_t, mscores_t = torch_superglue(
        sd, kpts0, kpts1, sc0, sc1, d0, d1, size,
        gnn_layers=4, heads=4, sinkhorn_iters=20, threshold=0.2)

    out = sg.forward_pair(
        params, jnp.asarray(kpts0), jnp.asarray(kpts1),
        jnp.asarray(sc0), jnp.asarray(sc1),
        jnp.asarray(d0), jnp.asarray(d1),
        jnp.ones(n0, bool), jnp.ones(n1, bool),
        jnp.asarray(size), jnp.asarray(size), conf=conf)

    np.testing.assert_array_equal(np.asarray(out["matches0"]), matches_t)
    np.testing.assert_allclose(np.asarray(out["matching_scores0"]),
                               mscores_t, atol=5e-4, rtol=1e-3)


# ---------------------------------------------------------------------------
# LoFTR cross-framework parity: published torch forward (ResNetFPN_8_2
# backbone with align-corners FPN upsampling, (elu+1) linear-attention
# encoder layers, dual-softmax coarse matching) vs our JAX
# implementation with identical weights. Reference wrapper:
# imcui/hloc/matchers/loftr.py (kornia LoFTR = the published zju3dv
# architecture).
# ---------------------------------------------------------------------------


def _lconv(sd, name, x, stride=1, pad=None):
    import torch.nn.functional as F
    w = torch.from_numpy(np.asarray(sd[f"{name}.weight"]))
    if pad is None:
        pad = w.shape[-1] // 2
    return F.conv2d(x, w, None, stride=stride, padding=pad)


def _lbn(sd, name, x):
    mu = torch.from_numpy(np.asarray(sd[f"{name}.running_mean"]))
    var = torch.from_numpy(np.asarray(sd[f"{name}.running_var"]))
    g = torch.from_numpy(np.asarray(sd[f"{name}.weight"]))
    b = torch.from_numpy(np.asarray(sd[f"{name}.bias"]))
    return (x - mu[:, None, None]) / torch.sqrt(
        var[:, None, None] + 1e-5) * g[:, None, None] + b[:, None, None]


def torch_loftr_backbone(sd, img):
    """ResNetFPN_8_2 (zju3dv LoFTR resnet_fpn.py) from the state_dict.
    img: (H, W) → (coarse (Hc, Wc, 256), fine (Hf, Wf, 128))."""
    import torch.nn.functional as F
    pre = "backbone"
    x = torch.from_numpy(img)[None, None]

    def block(name, x, stride):
        y = F.relu(_lbn(sd, f"{name}.bn1",
                        _lconv(sd, f"{name}.conv1", x, stride)[0])[None])
        y = _lbn(sd, f"{name}.bn2", _lconv(sd, f"{name}.conv2", y)[0])[None]
        if f"{name}.downsample.0.weight" in sd:
            x = _lbn(sd, f"{name}.downsample.1",
                     _lconv(sd, f"{name}.downsample.0", x, stride,
                            pad=0)[0])[None]
        return F.relu(x + y)

    x0 = F.relu(_lbn(sd, f"{pre}.bn1",
                     _lconv(sd, f"{pre}.conv1", x, 2)[0])[None])
    x1 = block(f"{pre}.layer1.1", block(f"{pre}.layer1.0", x0, 1), 1)
    x2 = block(f"{pre}.layer2.1", block(f"{pre}.layer2.0", x1, 2), 1)
    x3 = block(f"{pre}.layer3.1", block(f"{pre}.layer3.0", x2, 2), 1)

    def up2(t):  # upstream: align_corners=True
        return F.interpolate(t, scale_factor=2.0, mode="bilinear",
                             align_corners=True)

    x3_out = _lconv(sd, f"{pre}.layer3_outconv", x3, pad=0)
    x2_out = _lconv(sd, f"{pre}.layer2_outconv", x2, pad=0) + up2(x3_out)
    q = f"{pre}.layer2_outconv2"
    x2_out = _lconv(sd, f"{q}.3", F.leaky_relu(
        _lbn(sd, f"{q}.1", _lconv(sd, f"{q}.0", x2_out)[0])[None], 0.01))
    x1_out = _lconv(sd, f"{pre}.layer1_outconv", x1, pad=0) + up2(x2_out)
    q = f"{pre}.layer1_outconv2"
    x1_out = _lconv(sd, f"{q}.3", F.leaky_relu(
        _lbn(sd, f"{q}.1", _lconv(sd, f"{q}.0", x1_out)[0])[None], 0.01))
    return (np.asarray(x3_out[0].permute(1, 2, 0)),
            np.asarray(x1_out[0].permute(1, 2, 0)))


def torch_loftr_encoder_layer(sd, name, x, source, nhead=8):
    import torch.nn.functional as F

    def lin(nm, t):
        w = torch.from_numpy(np.asarray(sd[f"{nm}.weight"]))
        return t @ w.T

    n, d = x.shape
    dh = d // nhead
    q = lin(f"{name}.q_proj", x).reshape(n, nhead, dh)
    k = lin(f"{name}.k_proj", source).reshape(-1, nhead, dh)
    v = lin(f"{name}.v_proj", source).reshape(-1, nhead, dh)
    Q = F.elu(q) + 1.0
    K = F.elu(k) + 1.0
    kv = torch.einsum("mhd,mhv->hdv", K, v)
    z = 1.0 / (torch.einsum("nhd,hd->nh", Q, K.sum(0)) + 1e-6)
    msg = torch.einsum("nhd,hdv,nh->nhv", Q, kv, z).reshape(n, d)
    msg = lin(f"{name}.merge", msg)
    g = torch.from_numpy(np.asarray(sd[f"{name}.norm1.weight"]))
    b = torch.from_numpy(np.asarray(sd[f"{name}.norm1.bias"]))
    msg = F.layer_norm(msg, (d,), g, b)
    h = torch.cat([x, msg], -1)
    h = lin(f"{name}.mlp.2", F.relu(lin(f"{name}.mlp.0", h)))
    g = torch.from_numpy(np.asarray(sd[f"{name}.norm2.weight"]))
    b = torch.from_numpy(np.asarray(sd[f"{name}.norm2.bias"]))
    h = F.layer_norm(h, (d,), g, b)
    return x + h


@pytest.fixture(scope="module")
def loftr_fixture():
    from imcui_tpu.models.matchers import loftr
    params = loftr.init_params(jax.random.PRNGKey(31), n_coarse_layers=2,
                               n_fine_layers=2)
    sd = tree_to_state_dict(params)
    img = np.random.default_rng(7).uniform(size=(64, 96)).astype(np.float32)
    return params, sd, img


def test_loftr_backbone_parity(loftr_fixture):
    from imcui_tpu.models.matchers import loftr
    params, sd, img = loftr_fixture
    coarse_t, fine_t = torch_loftr_backbone(sd, img)
    c_j, f_j = loftr.backbone_apply(params["backbone"],
                                    jnp.asarray(img)[None, :, :, None])
    np.testing.assert_allclose(np.asarray(c_j)[0], coarse_t,
                               atol=5e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(f_j)[0], fine_t,
                               atol=5e-4, rtol=1e-3)


def test_loftr_encoder_layer_parity(loftr_fixture):
    from imcui_tpu.models.matchers import loftr
    params, sd, _ = loftr_fixture
    rng = np.random.default_rng(8)
    x = rng.normal(size=(20, 256)).astype(np.float32)
    src = rng.normal(size=(24, 256)).astype(np.float32)
    ref = torch_loftr_encoder_layer(
        sd, "loftr_coarse.layers.0", torch.from_numpy(x),
        torch.from_numpy(src))
    got = loftr.encoder_layer(params["loftr_coarse"]["layers"][0],
                              jnp.asarray(x), jnp.asarray(src))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


# ---------------------------------------------------------------------------
# DINOv2 ViT cross-framework parity (RoMa's encoder): published torch
# forward (patch embed → +cls/pos → pre-norm attention with LayerScale →
# exact-GELU MLP → final norm) from an upstream-named synthetic
# state_dict, vs our JAX implementation through the REAL conversion path
# (backbones/dinov2.convert_state_dict). Grid == pretraining grid so the
# bicubic pos-embed interpolation (torch a=-0.75 vs jax a=-0.5 cubic
# kernels — intentionally not bit-matched) stays inactive.
# ---------------------------------------------------------------------------


def _make_dinov2_sd(rng, dim=64, depth=2, grid=4, patch=14):
    sd = {}
    sd["patch_embed.proj.weight"] = rng.normal(
        size=(dim, 3, patch, patch)).astype(np.float32) * 0.02
    sd["patch_embed.proj.bias"] = rng.normal(size=(dim,)).astype(np.float32)
    sd["cls_token"] = rng.normal(size=(1, 1, dim)).astype(np.float32) * 0.02
    sd["pos_embed"] = rng.normal(
        size=(1, 1 + grid * grid, dim)).astype(np.float32) * 0.02
    for i in range(depth):
        b = f"blocks.{i}"
        for nm, shape in ((f"{b}.attn.qkv", (3 * dim, dim)),
                          (f"{b}.attn.proj", (dim, dim)),
                          (f"{b}.mlp.fc1", (4 * dim, dim)),
                          (f"{b}.mlp.fc2", (dim, 4 * dim))):
            sd[f"{nm}.weight"] = rng.normal(size=shape).astype(
                np.float32) * 0.05
            sd[f"{nm}.bias"] = rng.normal(size=(shape[0],)).astype(
                np.float32) * 0.02
        for nm in (f"{b}.norm1", f"{b}.norm2"):
            sd[f"{nm}.weight"] = 1 + 0.1 * rng.normal(
                size=(dim,)).astype(np.float32)
            sd[f"{nm}.bias"] = 0.1 * rng.normal(size=(dim,)).astype(
                np.float32)
        sd[f"{b}.ls1.gamma"] = rng.uniform(
            0.5, 1.5, (dim,)).astype(np.float32)
        sd[f"{b}.ls2.gamma"] = rng.uniform(
            0.5, 1.5, (dim,)).astype(np.float32)
    sd["norm.weight"] = 1 + 0.1 * rng.normal(size=(dim,)).astype(np.float32)
    sd["norm.bias"] = 0.1 * rng.normal(size=(dim,)).astype(np.float32)
    return sd


def torch_dinov2(sd, img, dim, depth, heads, patch):
    import torch.nn.functional as F

    t = {k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}
    x = torch.from_numpy(img).permute(2, 0, 1)[None]
    x = F.conv2d(x, t["patch_embed.proj.weight"],
                 t["patch_embed.proj.bias"], stride=patch)
    hp, wp = x.shape[-2:]
    x = x.flatten(2).transpose(1, 2)[0]                # (Hp*Wp, dim)
    x = torch.cat([t["cls_token"][0], x], 0)
    x = x + t["pos_embed"][0]

    def ln(nm, y):
        return F.layer_norm(y, (dim,), t[f"{nm}.weight"], t[f"{nm}.bias"])

    for i in range(depth):
        b = f"blocks.{i}"
        y = ln(f"{b}.norm1", x)
        qkv = y @ t[f"{b}.attn.qkv.weight"].T + t[f"{b}.attn.qkv.bias"]
        n = y.shape[0]
        dh = dim // heads
        qkv = qkv.reshape(n, 3, heads, dh).permute(1, 2, 0, 3)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attnmat = (q @ k.transpose(-2, -1)) / dh ** 0.5
        out = (attnmat.softmax(-1) @ v).permute(1, 0, 2).reshape(n, dim)
        out = out @ t[f"{b}.attn.proj.weight"].T + t[f"{b}.attn.proj.bias"]
        x = x + t[f"{b}.ls1.gamma"] * out
        y = ln(f"{b}.norm2", x)
        h = F.gelu(y @ t[f"{b}.mlp.fc1.weight"].T + t[f"{b}.mlp.fc1.bias"])
        h = h @ t[f"{b}.mlp.fc2.weight"].T + t[f"{b}.mlp.fc2.bias"]
        x = x + t[f"{b}.ls2.gamma"] * h
    x = ln("norm", x)
    return np.asarray(x[1:])                           # patch tokens


def test_dinov2_forward_parity():
    from imcui_tpu.models.backbones import dinov2

    dim, depth, heads, patch, grid = 64, 2, 4, 14, 4
    cfg = {"dim": dim, "depth": depth, "num_heads": heads, "patch": patch,
           "mlp_ratio": 4, "pretrain_grid": grid}
    rng = np.random.default_rng(9)
    sd = _make_dinov2_sd(rng, dim, depth, grid, patch)
    params = dinov2.convert_state_dict(sd, depth)

    img = rng.uniform(size=(grid * patch, grid * patch, 3)).astype(
        np.float32)
    ref = torch_dinov2(sd, img, dim, depth, heads, patch)
    got, (hp, wp) = dinov2.apply(params, jnp.asarray(img), cfg,
                                 normalize=False)
    assert (hp, wp) == (grid, grid)
    np.testing.assert_allclose(np.asarray(got), ref, atol=5e-5, rtol=1e-4)


# ---------------------------------------------------------------------------
# Op-semantics parity: every shared building-block op vs its exact torch
# equivalent. This pins the CLASS of bug the model fixtures above caught
# (tanh-vs-erf GELU, asymmetric stride-2 padding, align-corners
# upsampling) for the ops all other converted models are built from.
# ---------------------------------------------------------------------------


def test_op_semantics_vs_torch():
    import torch.nn.functional as F
    from imcui_tpu.models import layers

    rng = np.random.default_rng(11)
    x = rng.normal(size=(2, 8, 12, 16)).astype(np.float32)
    xj = jnp.asarray(x)
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)

    def chk(name, j, t, atol=1e-5):
        np.testing.assert_allclose(
            np.asarray(j), np.asarray(t.permute(0, 2, 3, 1)), atol=atol,
            err_msg=name)

    # gelu: exact erf (torch nn.GELU default)
    np.testing.assert_allclose(
        np.asarray(layers.gelu(xj)),
        np.asarray(F.gelu(torch.from_numpy(x))), atol=1e-6,
        err_msg="gelu")

    # stride-2 conv, odd kernels: torch symmetric padding
    for k in (3, 5, 7):
        w = rng.normal(size=(k, k, 16, 8)).astype(np.float32) * 0.1
        wt = torch.from_numpy(w).permute(3, 2, 0, 1)
        for s in (1, 2):
            chk(f"conv{k}s{s}",
                layers.conv2d({"w": jnp.asarray(w)}, xj, stride=s),
                F.conv2d(xt, wt, stride=s, padding=k // 2), atol=1e-4)

    # dilated conv (r2d2-style): torch padding = d*(k-1)//2
    w = rng.normal(size=(3, 3, 16, 8)).astype(np.float32) * 0.1
    wt = torch.from_numpy(w).permute(3, 2, 0, 1)
    chk("conv3d2", layers.conv2d({"w": jnp.asarray(w)}, xj, dilation=2),
        F.conv2d(xt, wt, padding=2, dilation=2), atol=1e-4)

    # max/avg pool 2x2 stride 2
    chk("maxpool", layers.max_pool(xj), F.max_pool2d(xt, 2, 2))
    from imcui_tpu.models.extractors.disk import avg_pool, instance_norm, \
        prelu
    chk("avgpool", avg_pool(xj), F.avg_pool2d(xt, 2, 2))

    # instance norm (affine-free, eps 1e-5 = torch default)
    chk("instnorm", instance_norm(xj), F.instance_norm(xt), atol=1e-4)

    # PReLU per-channel
    a = rng.uniform(0.1, 0.5, 16).astype(np.float32)
    chk("prelu", prelu({"alpha": jnp.asarray(a)}, xj),
        F.prelu(xt, torch.from_numpy(a)))

    # layer norm eps (1e-5 = torch default)
    g = rng.normal(size=(16,)).astype(np.float32)
    b = rng.normal(size=(16,)).astype(np.float32)
    got = layers.layer_norm({"scale": jnp.asarray(g),
                             "bias": jnp.asarray(b)}, xj)
    want = F.layer_norm(torch.from_numpy(x), (16,), torch.from_numpy(g),
                        torch.from_numpy(b))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, err_msg="layernorm")

    # batch norm inference eps
    bn = {"scale": jnp.asarray(g), "bias": jnp.asarray(b),
          "mean": jnp.asarray(rng.normal(size=16).astype(np.float32)),
          "var": jnp.asarray(rng.uniform(0.5, 2, 16).astype(np.float32))}
    got = layers.batch_norm_inference(bn, xj)
    want = F.batch_norm(xt, torch.from_numpy(np.asarray(bn["mean"])),
                        torch.from_numpy(np.asarray(bn["var"])),
                        torch.from_numpy(g), torch.from_numpy(b),
                        training=False)
    chk("batchnorm", got, want, atol=1e-4)

    # half-pixel bilinear x2 (torch align_corners=False) == jax resize
    up_t = F.interpolate(xt, scale_factor=2.0, mode="bilinear",
                         align_corners=False)
    up_j = jax.image.resize(xj, (2, 16, 24, 16), method="bilinear")
    chk("bilinear_halfpixel", up_j, up_t, atol=1e-5)

    # align-corners bilinear x2 == loftr._upsample2
    from imcui_tpu.models.matchers.loftr import _upsample2
    up_t = F.interpolate(xt, scale_factor=2.0, mode="bilinear",
                         align_corners=True)
    chk("bilinear_aligncorners", _upsample2(xj), up_t, atol=1e-5)

    # elu+1 feature map (loftr linear attention)
    np.testing.assert_allclose(
        np.asarray(jax.nn.elu(xj) + 1.0),
        np.asarray(F.elu(torch.from_numpy(x)) + 1.0), atol=1e-6,
        err_msg="elu")
