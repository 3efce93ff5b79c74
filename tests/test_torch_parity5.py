"""Round-3 cross-framework parity fixtures, batch 5.

Same pattern as tests/test_torch_parity{,2,3,4}.py — functional
torch/numpy (CPU, f64 where it pins better) restatements run against the
JAX implementations with identical weights. This batch closes out the
zoo families that still had only structural round-trips:

- LISRD's meta-weighted mutual-NN matcher (the logic lives in the
  reference wrapper itself, imcui/hloc/matchers/lisrd.py:122-151: a
  softmax over the four invariance axes of the meta-descriptor
  similarity weights the per-invariance descriptor similarities) —
  restated in torch einsum form and pinned on the similarity matrix,
  the mutual match set, and the confidence map,
- SE2-LoFTR's cyclic-group conv construction (lift + group conv +
  orientation max-pool): exact C4 equivariance — rotating the input 90°
  permutes the orientation channels of the lifted features and the
  orientation-pooled map is exactly rotation-equivariant,
- RDD's deformable-attention encoder layer (predicted offsets, softmax
  point weights, bilinear value gathers) against an explicit-loop
  numpy f64 restatement,
- OmniGlue's DINO-guidance GNN layer (cross attention with an additive
  foundation-similarity bias + concat-MLP residual) against a torch
  restatement with identical weights,
- GeM pooling (the retrieval heads of cosplace/eigenplaces/dir) against
  the published torch formulation clamp(x, eps).pow(p).mean().pow(1/p),
- FIRe's LIT iterative super-feature attention (query-axis softmax +
  mass renormalisation + LN residual) against an f64 restatement.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")


def _np(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x, np.float64), tree)


def _linear_np(p, x):
    out = x @ p["w"]
    if "b" in p and p["b"] is not None:
        out = out + p["b"]
    return out


def _layer_norm_np(p, x, eps=1e-5):
    mean = x.mean(-1, keepdims=True)
    var = ((x - mean) ** 2).mean(-1, keepdims=True)
    return (x - mean) / np.sqrt(var + eps) * p["scale"] + p["bias"]


# ---------------------------------------------------------------------------
# LISRD — meta-weighted mutual-NN matching.
# ---------------------------------------------------------------------------


def test_lisrd_meta_weighted_matcher_parity():
    from imcui_tpu.models.matchers.lisrd import lisrd_match

    rng = np.random.default_rng(0)
    n0, n1, d, dm = 37, 29, 16, 12
    desc0 = rng.standard_normal((n0, 4, d)).astype(np.float32)
    desc1 = rng.standard_normal((n1, 4, d)).astype(np.float32)
    meta0 = rng.standard_normal((n0, 4, dm)).astype(np.float32)
    meta1 = rng.standard_normal((n1, 4, dm)).astype(np.float32)
    mask0 = np.ones((n0,), bool)
    mask1 = np.ones((n1,), bool)
    mask0[-5:] = False  # padded tail slots must never match
    mask1[-3:] = False

    matches, scores = jax.jit(lisrd_match)(
        jnp.asarray(desc0), jnp.asarray(desc1),
        jnp.asarray(meta0), jnp.asarray(meta1),
        jnp.asarray(mask0), jnp.asarray(mask1))
    matches = np.asarray(matches)
    scores = np.asarray(scores)

    # torch restatement of the published matcher: descriptors and meta
    # descriptors are L2-normalised per invariance, the meta similarity
    # softmaxes over the invariance axis into per-pair weights, and the
    # weighted descriptor similarity is mutual-NN matched.
    t = lambda a: torch.from_numpy(a[: len(a)]).double()
    td0 = torch.nn.functional.normalize(t(desc0), dim=-1)[mask0]
    td1 = torch.nn.functional.normalize(t(desc1), dim=-1)[mask1]
    tm0 = torch.nn.functional.normalize(t(meta0), dim=-1)[mask0]
    tm1 = torch.nn.functional.normalize(t(meta1), dim=-1)[mask1]
    w = torch.softmax(torch.einsum("nid,mid->nim", tm0, tm1), dim=1)
    sims = (torch.einsum("nid,mid->nim", td0, td1) * w).sum(1)
    nn12 = sims.max(dim=1)[1]
    nn21 = sims.max(dim=0)[1]
    ids = torch.arange(sims.shape[0])
    mutual = ids == nn21[nn12]

    valid_ids = np.nonzero(mutual.numpy())[0]
    # match set: identical pairs (valid region indices coincide because
    # the masked slots are a contiguous tail)
    ref_pairs = {(int(i), int(nn12[i])) for i in valid_ids}
    got_pairs = {(i, int(matches[i])) for i in range(n0) if matches[i] >= 0}
    assert got_pairs == ref_pairs
    # confidence: the raw weighted cosine, exactly the reference's
    # mconf (_compute_confidence, imcui/hloc/matchers/lisrd.py:137-149)
    for i, j in ref_pairs:
        np.testing.assert_allclose(scores[i], float(sims[i, j]),
                                   atol=2e-5)
    # masked query slots never match
    assert (matches[~mask0] == -1).all()


# ---------------------------------------------------------------------------
# SE2-LoFTR — cyclic-group conv equivariance. Rotating the input by 90°
# must (a) permute the orientation channels of the lifted features while
# rotating them spatially, and (b) leave the orientation-max-pooled map
# exactly rotation-equivariant. Stride 1 keeps the sampling grid
# rotation-symmetric (the published steerable design has the same
# property; the strided production path trades exactness at borders).
# ---------------------------------------------------------------------------


def test_se2loftr_group_conv_c4_equivariance():
    from imcui_tpu.models.matchers.se2loftr import (GROUP, group_conv,
                                                    lift_conv)

    rng = jax.random.PRNGKey(3)
    k1, k2, k3 = jax.random.split(rng, 3)
    x = jax.random.normal(k1, (1, 12, 12, 1))
    wl = jax.random.normal(k2, (7, 7, 1, 6)) * 0.2
    wg = jax.random.normal(k3, (3, 3, GROUP * 6, 8)) * 0.2

    xr = jnp.rot90(x, k=1, axes=(1, 2))

    lift = lift_conv(wl, x, stride=1)          # (1, H, W, GROUP*6)
    lift_r = lift_conv(wl, xr, stride=1)

    def split(y, c):
        return y.reshape(y.shape[0], y.shape[1], y.shape[2], GROUP, c)

    # orientation channel g of the rotated input equals the rotation of
    # orientation channel g-1 of the original input
    ls = split(lift, 6)
    lrs = split(lift_r, 6)
    for g in range(GROUP):
        np.testing.assert_allclose(
            np.asarray(lrs[..., g, :]),
            np.asarray(jnp.rot90(ls[..., (g - 1) % GROUP, :], k=1,
                                 axes=(1, 2))),
            atol=1e-5)

    # full chain: lift → group conv → orientation max-pool is exactly
    # rotation-equivariant
    g1 = group_conv(wg, lift, 8)
    g1r = group_conv(wg, lift_r, 8)
    inv = split(g1, 8).max(3)
    inv_r = split(g1r, 8).max(3)
    np.testing.assert_allclose(
        np.asarray(inv_r),
        np.asarray(jnp.rot90(inv, k=1, axes=(1, 2))),
        atol=1e-5)


# ---------------------------------------------------------------------------
# RDD — deformable-attention encoder layer vs an explicit-loop f64
# restatement (torchvision-free: the deformable op is predicted offsets +
# softmax point weights + bilinear gathers from the value map).
# ---------------------------------------------------------------------------


def test_rdd_deform_layer_parity():
    from imcui_tpu.models.extractors.rdd import (N_POINTS, deform_layer,
                                                 init_deform_layer)

    d = 32
    h, w = 7, 9
    p = init_deform_layer(jax.random.PRNGKey(5), d)
    # non-trivial LN params
    p["ln1"]["scale"] = p["ln1"]["scale"] * 1.3 + 0.1
    p["ln2"]["bias"] = p["ln2"]["bias"] + 0.05
    fmap = jax.random.normal(jax.random.PRNGKey(6), (h, w, d))

    out = np.asarray(jax.jit(deform_layer)(p, fmap))

    pn = _np(p)
    fm = np.asarray(fmap, np.float64)
    x = fm.reshape(-1, d)
    ref = np.stack(np.meshgrid(np.arange(w), np.arange(h)), -1)
    ref = ref.reshape(-1, 2).astype(np.float64)  # (N, 2) as (x, y)

    offs = _linear_np(pn["offset"], x).reshape(-1, N_POINTS, 2)
    logits = _linear_np(pn["attn_w"], x)
    attn = np.exp(logits - logits.max(-1, keepdims=True))
    attn = attn / attn.sum(-1, keepdims=True)
    vmap = _linear_np(pn["value"], fm)  # (H, W, D)

    agg = np.zeros((h * w, d))
    for i in range(h * w):
        for pt in range(N_POINTS):
            px = min(max(ref[i, 0] + offs[i, pt, 0], 0.0), w - 1.0)
            py = min(max(ref[i, 1] + offs[i, pt, 1], 0.0), h - 1.0)
            x0, y0 = int(np.floor(px)), int(np.floor(py))
            x1, y1 = min(x0 + 1, w - 1), min(y0 + 1, h - 1)
            fx, fy = px - x0, py - y0
            val = ((vmap[y0, x0] * (1 - fx) + vmap[y0, x1] * fx) * (1 - fy)
                   + (vmap[y1, x0] * (1 - fx) + vmap[y1, x1] * fx) * fy)
            agg[i] += attn[i, pt] * val
    y = _layer_norm_np(pn["ln1"], x + _linear_np(pn["out"], agg))
    y = _layer_norm_np(
        pn["ln2"],
        y + _linear_np(pn["ffn2"],
                       np.maximum(_linear_np(pn["ffn1"], y), 0.0)))
    np.testing.assert_allclose(out, y.reshape(h, w, d), atol=5e-5)


# ---------------------------------------------------------------------------
# OmniGlue — DINO-guided GNN layer: cross attention whose logits carry an
# additive foundation-similarity bias, masked keys, concat-MLP residual.
# ---------------------------------------------------------------------------


def test_omniglue_gnn_bias_layer_parity():
    from imcui_tpu.models.matchers.omniglue import NHEAD, gnn_layer
    from imcui_tpu.models.layers import init_linear

    d = 64
    n0, n1 = 21, 17
    keys = jax.random.split(jax.random.PRNGKey(7), 5)
    p = {
        "qkv": init_linear(keys[0], d, 3 * d),
        "mlp": {"0": init_linear(keys[1], 2 * d, 2 * d),
                "2": init_linear(keys[2], 2 * d, d)},
    }
    x = jax.random.normal(keys[3], (n0, d))
    src = jax.random.normal(keys[4], (n1, d))
    bias = jax.random.normal(jax.random.PRNGKey(8), (n0, n1)) * 0.5
    mask = np.ones((n1,), bool)
    mask[-4:] = False

    out = np.asarray(jax.jit(gnn_layer)(
        p, x, src, jnp.asarray(mask), bias=jnp.asarray(bias)[None]))

    pn = _np(p)
    xn = np.asarray(x, np.float64)
    sn = np.asarray(src, np.float64)
    tq = torch.from_numpy(_linear_np(pn["qkv"], xn)[:, :d])
    tkv = _linear_np(pn["qkv"], sn)
    tk = torch.from_numpy(tkv[:, d:2 * d])
    tv = torch.from_numpy(tkv[:, 2 * d:])
    dh = d // NHEAD
    q = tq.reshape(n0, NHEAD, dh).permute(1, 0, 2)
    k = tk.reshape(n1, NHEAD, dh).permute(1, 0, 2)
    v = tv.reshape(n1, NHEAD, dh).permute(1, 0, 2)
    logits = q @ k.transpose(-1, -2) / dh ** 0.5
    logits = logits + torch.from_numpy(np.asarray(bias, np.float64))[None]
    logits[:, :, ~mask] = -1e30
    msg = (torch.softmax(logits, -1) @ v).permute(1, 0, 2).reshape(n0, d)
    cat = np.concatenate([xn, msg.numpy()], -1)
    ref = xn + _linear_np(pn["mlp"]["2"],
                          np.maximum(_linear_np(pn["mlp"]["0"], cat), 0.0))
    np.testing.assert_allclose(out, ref, atol=5e-5)


# ---------------------------------------------------------------------------
# GeM pooling — the retrieval head shared by cosplace/eigenplaces/dir.
# Published torch form: x.clamp(min=eps).pow(p).mean((-2, -1)).pow(1/p).
# ---------------------------------------------------------------------------


def test_gem_pool_parity():
    from imcui_tpu.models.backbones.resnet import gem_pool

    rng = np.random.default_rng(11)
    x = (rng.standard_normal((2, 5, 7, 16)) * 2.0).astype(np.float32)
    for p in (3.0, 1.0, 4.6):
        out = np.asarray(gem_pool(jnp.asarray(x), p=p))
        tx = torch.from_numpy(x).double().permute(0, 3, 1, 2)  # NCHW
        ref = tx.clamp(min=1e-6).pow(p).mean((-2, -1)).pow(1.0 / p)
        np.testing.assert_allclose(out, ref.numpy(), atol=1e-5)


# ---------------------------------------------------------------------------
# FIRe — LIT iterative super-feature attention: K learned queries
# cross-attend to the token map, softmax over the QUERY axis (each
# location votes for its best super-feature), per-query mass
# renormalisation, LN residual update, final L2 norm + mass weighting.
# ---------------------------------------------------------------------------


def test_fire_superfeatures_parity():
    from imcui_tpu.models.extractors.fire import (DIM, N_ITER, N_SUPER,
                                                  superfeatures)
    from imcui_tpu.models.layers import init_layer_norm, init_linear

    keys = jax.random.split(jax.random.PRNGKey(13), 4)
    params = {
        "queries": jax.random.normal(keys[0], (N_SUPER, DIM)) * 0.02,
        "q_proj": init_linear(keys[1], DIM, DIM),
        "k_proj": init_linear(keys[2], DIM, DIM),
        "v_proj": init_linear(keys[3], DIM, DIM),
        "ln": init_layer_norm(DIM),
    }
    params["ln"]["scale"] = params["ln"]["scale"] * 1.1 + 0.05
    fmap = jax.random.normal(jax.random.PRNGKey(14), (1, 6, 8, DIM))

    sf, mass = jax.jit(superfeatures)(params, fmap)
    sf = np.asarray(sf)[0]
    mass = np.asarray(mass)[0]

    pn = _np(params)
    tokens = np.asarray(fmap, np.float64)[0].reshape(-1, DIM)
    k = _linear_np(pn["k_proj"], tokens)
    v = _linear_np(pn["v_proj"], tokens)
    q = pn["queries"].copy()
    ref_mass = None
    for _ in range(N_ITER):
        logits = _linear_np(pn["q_proj"], q) @ k.T / np.sqrt(DIM)
        e = np.exp(logits - logits.max(0, keepdims=True))
        attn = e / e.sum(0, keepdims=True)          # softmax over queries
        # importance is the PRE-renormalisation mass (post-renorm rows
        # sum to 1 identically, which would make this pin vacuous)
        ref_mass = attn.sum(-1)
        attn = attn / np.maximum(ref_mass[:, None], 1e-6)
        q = _layer_norm_np(pn["ln"], q + attn @ v)
    q = q / np.maximum(np.linalg.norm(q, axis=-1, keepdims=True), 1e-8)
    np.testing.assert_allclose(sf, q, atol=5e-5)
    np.testing.assert_allclose(mass, ref_mass, atol=5e-5)
    # non-degeneracy: the importance signal must actually vary per
    # query, so apply_global's (sf * mass) weighting is not a no-op
    assert np.std(ref_mass) > 1e-3
