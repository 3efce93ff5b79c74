"""LoFTR detector-free coarse-to-fine matcher, native JAX/XLA.

Re-implementation of the architecture behind the reference wrapper
(reference: imcui/hloc/matchers/loftr.py:12-71, which wraps kornia's LoFTR
— rebuilt here from the published architecture: ResNet-FPN 1/8 + 1/2
features, sinusoidal position encoding, 4×(self+cross) linear-attention
coarse transformer, dual-softmax coarse assignment, 5×5-window fine
refinement with spatial-expectation subpixel output).

TPU-first redesign:
- **Fixed-M matches.** The coarse assignment keeps a static ``max_matches``
  top-confidence cells with a validity mask instead of dynamic mutual-NN
  sets — one executable per config, whole pair-batches vmapped.
- **Linear attention as einsums.** The (elu+1) feature-map attention is
  three MXU einsums with masked K/V — O(N·d²) instead of O(N²·d), ideal
  for 1/8-grid token counts (~10⁴).
- **Fine windows by gather.** The unfold/crop around coarse matches is a
  vmapped dynamic-slice gather over the fine feature map — no host logic.

Weight conversion: param paths mirror the kornia/official state_dict
(backbone.conv1/bn1/layer{1,2,3}.{0,1}.*, backbone.layer*_outconv*,
loftr_coarse.layers.{i}.{q_proj,k_proj,v_proj,merge,mlp.0,mlp.2,norm1,
norm2}, fine_preprocess.*, loftr_fine.layers.*).
"""

import functools

import jax
import jax.numpy as jnp

from ...utils.base_model import BaseModel
from ...utils.weights import download_checkpoint, load_state_dict
from ..layers import (batch_norm_inference, conv2d, init_conv,
                      init_layer_norm, init_linear, layer_norm, linear,
                      relu)

D_COARSE = 256
D_FINE = 128
FINE_WINDOW = 5


# ---------------------------------------------------------------------------
# ResNet-FPN backbone (strides 8 and 2)
# ---------------------------------------------------------------------------

def init_bn(c):
    return {"scale": jnp.ones((c,)), "bias": jnp.zeros((c,)),
            "mean": jnp.zeros((c,)), "var": jnp.ones((c,))}


def init_basic_block(key, cin, cout, stride):
    k1, k2, k3 = jax.random.split(key, 3)
    p = {
        "conv1": init_conv(k1, 3, 3, cin, cout, bias=False),
        "bn1": init_bn(cout),
        "conv2": init_conv(k2, 3, 3, cout, cout, bias=False),
        "bn2": init_bn(cout),
    }
    if stride != 1:
        p["downsample"] = {
            "0": init_conv(k3, 1, 1, cin, cout, bias=False),
            "1": init_bn(cout),
        }
    return p


def basic_block(p, x, stride):
    y = conv2d(p["conv1"], x, stride=stride)
    y = relu(batch_norm_inference(p["bn1"], y))
    y = conv2d(p["conv2"], y)
    y = batch_norm_inference(p["bn2"], y)
    if "downsample" in p:
        x = batch_norm_inference(
            p["downsample"]["1"], conv2d(p["downsample"]["0"], x,
                                         stride=stride)
        )
    return relu(x + y)


def init_backbone(rng):
    dims = [128, 196, 256]
    keys = jax.random.split(rng, 16)
    p = {
        "conv1": init_conv(keys[0], 7, 7, 1, 128, bias=False),
        "bn1": init_bn(128),
        "layer1": {"0": init_basic_block(keys[1], 128, dims[0], 1),
                   "1": init_basic_block(keys[2], dims[0], dims[0], 1)},
        "layer2": {"0": init_basic_block(keys[3], dims[0], dims[1], 2),
                   "1": init_basic_block(keys[4], dims[1], dims[1], 1)},
        "layer3": {"0": init_basic_block(keys[5], dims[1], dims[2], 2),
                   "1": init_basic_block(keys[6], dims[2], dims[2], 1)},
        "layer3_outconv": init_conv(keys[7], 1, 1, dims[2], D_COARSE,
                                    bias=False),
        "layer2_outconv": init_conv(keys[8], 1, 1, dims[1], D_COARSE,
                                    bias=False),
        "layer2_outconv2": {
            "0": init_conv(keys[9], 3, 3, D_COARSE, D_COARSE, bias=False),
            "1": init_bn(D_COARSE),
            "3": init_conv(keys[10], 3, 3, D_COARSE, dims[1], bias=False),
        },
        "layer1_outconv": init_conv(keys[11], 1, 1, dims[0], dims[1],
                                    bias=False),
        "layer1_outconv2": {
            "0": init_conv(keys[12], 3, 3, dims[1], dims[1], bias=False),
            "1": init_bn(dims[1]),
            "3": init_conv(keys[13], 3, 3, dims[1], D_FINE, bias=False),
        },
    }
    return p


def _upsample2(x):
    """Bilinear ×2 upsampling, NHWC, ALIGN_CORNERS=TRUE — the upstream
    FPN uses F.interpolate(..., align_corners=True) (zju3dv LoFTR
    resnet_fpn.py); jax.image.resize only offers the half-pixel
    convention, which shifts every upsampled feature by ~0.25 px
    (caught by tests/test_torch_parity.py::test_loftr_backbone_parity).
    Implemented as two 1-D gathers with precomputed weights."""
    import numpy as np

    def up_dim(t, axis, n_in):
        n_out = 2 * n_in
        if n_in == 1:
            return jnp.repeat(t, 2, axis)
        s = np.arange(n_out) * (n_in - 1) / (n_out - 1)
        i0 = np.clip(np.floor(s).astype(int), 0, n_in - 2)
        frac = s - i0
        t0 = jnp.take(t, i0, axis)
        t1 = jnp.take(t, i0 + 1, axis)
        fshape = [1] * t.ndim
        fshape[axis] = n_out
        fr = jnp.asarray(frac, t.dtype).reshape(fshape)
        return t0 * (1 - fr) + t1 * fr

    _, h, w, _ = x.shape
    return up_dim(up_dim(x, 1, h), 2, w)


def leaky_relu(x, slope=0.01):
    return jnp.where(x >= 0, x, slope * x)


def backbone_apply(p, x):
    """x: (B, H, W, 1) → coarse (B, H/8, W/8, 256), fine (B, H/2, W/2, 128)."""
    x0 = relu(batch_norm_inference(p["bn1"], conv2d(p["conv1"], x,
                                                    stride=2)))
    x1 = basic_block(p["layer1"]["1"],
                     basic_block(p["layer1"]["0"], x0, 1), 1)  # 1/2
    x2 = basic_block(p["layer2"]["1"],
                     basic_block(p["layer2"]["0"], x1, 2), 1)  # 1/4
    x3 = basic_block(p["layer3"]["1"],
                     basic_block(p["layer3"]["0"], x2, 2), 1)  # 1/8

    x3_out = conv2d(p["layer3_outconv"], x3)
    x3_up = _upsample2(x3_out)
    x2_out = conv2d(p["layer2_outconv"], x2) + x3_up
    q = p["layer2_outconv2"]
    x2_out = conv2d(q["3"], leaky_relu(batch_norm_inference(
        q["1"], conv2d(q["0"], x2_out))))
    x2_up = _upsample2(x2_out)
    x1_out = conv2d(p["layer1_outconv"], x1) + x2_up
    q = p["layer1_outconv2"]
    x1_out = conv2d(q["3"], leaky_relu(batch_norm_inference(
        q["1"], conv2d(q["0"], x1_out))))
    return x3_out, x1_out


# ---------------------------------------------------------------------------
# position encoding + linear attention transformer
# ---------------------------------------------------------------------------

def position_encoding(h, w, d=D_COARSE):
    """2-D sinusoidal encoding (h, w, d) — LoFTR's PositionEncodingSine."""
    y = jnp.arange(h, dtype=jnp.float32)[:, None, None]
    x = jnp.arange(w, dtype=jnp.float32)[None, :, None]
    div = jnp.exp(
        jnp.arange(0, d // 2, 2, dtype=jnp.float32)
        * (-jnp.log(10000.0) / (d // 2))
    )[None, None, :]
    pe = jnp.zeros((h, w, d))
    pe = pe.at[..., 0::4].set(jnp.sin(x * div))
    pe = pe.at[..., 1::4].set(jnp.cos(x * div))
    pe = pe.at[..., 2::4].set(jnp.sin(y * div))
    pe = pe.at[..., 3::4].set(jnp.cos(y * div))
    return pe


def init_encoder_layer(key, d, nhead=8):
    k = jax.random.split(key, 6)
    return {
        "q_proj": init_linear(k[0], d, d, bias=False),
        "k_proj": init_linear(k[1], d, d, bias=False),
        "v_proj": init_linear(k[2], d, d, bias=False),
        "merge": init_linear(k[3], d, d, bias=False),
        "mlp": {"0": init_linear(k[4], 2 * d, 2 * d, bias=False),
                "2": init_linear(k[5], 2 * d, d, bias=False)},
        "norm1": init_layer_norm(d),
        "norm2": init_layer_norm(d),
    }


def linear_attention(q, k, v, mask_kv=None, eps=1e-6):
    """(elu+1) linear attention. q: (N, h, dh), k/v: (M, h, dh)."""
    q = jax.nn.elu(q) + 1.0
    k = jax.nn.elu(k) + 1.0
    if mask_kv is not None:
        k = k * mask_kv[:, None, None]
        v = v * mask_kv[:, None, None]
    kv = jnp.einsum("mhd,mhv->hdv", k, v,
                    preferred_element_type=jnp.float32)
    z = 1.0 / (jnp.einsum("nhd,hd->nh", q, k.sum(0),
                          preferred_element_type=jnp.float32) + eps)
    out = jnp.einsum("nhd,hdv,nh->nhv", q, kv, z,
                     preferred_element_type=jnp.float32)
    return out.astype(v.dtype)


def encoder_layer(p, x, source, mask_src=None, nhead=8):
    """LoFTREncoderLayer: x attends to source. x: (N, d)."""
    n, d = x.shape
    dh = d // nhead
    q = linear(p["q_proj"], x).reshape(n, nhead, dh)
    k = linear(p["k_proj"], source).reshape(-1, nhead, dh)
    v = linear(p["v_proj"], source).reshape(-1, nhead, dh)
    message = linear_attention(q, k, v, mask_kv=mask_src)
    message = linear(p["merge"], message.reshape(n, d))
    message = layer_norm(p["norm1"], message)
    message = jnp.concatenate([x, message], -1)
    message = linear(p["mlp"]["2"], relu(linear(p["mlp"]["0"], message)))
    message = layer_norm(p["norm2"], message)
    return x + message


# ---------------------------------------------------------------------------
# full model
# ---------------------------------------------------------------------------

def init_params(rng, n_coarse_layers=4, n_fine_layers=2):
    keys = jax.random.split(rng, 4 + n_coarse_layers + n_fine_layers)
    params = {
        "backbone": init_backbone(keys[0]),
        "loftr_coarse": {"layers": [
            init_encoder_layer(keys[1 + i], D_COARSE)
            for i in range(n_coarse_layers)
        ]},
        "fine_preprocess": {
            "down_proj": init_linear(keys[1 + n_coarse_layers], D_COARSE,
                                     D_FINE),
            "merge_feat": init_linear(keys[2 + n_coarse_layers], 2 * D_FINE,
                                      D_FINE),
        },
        "loftr_fine": {"layers": [
            init_encoder_layer(keys[3 + n_coarse_layers + i], D_FINE)
            for i in range(n_fine_layers)
        ]},
    }
    return params


def load_params(conf):
    init = init_params(jax.random.PRNGKey(0))
    npz = conf.get("checkpoint_npz")
    if npz:
        # locally trained tree (`imcui-tpu train loftr` output) — the
        # training subsystem's trees are the serving trees
        from ...utils.weights import load_tree_npz
        return load_tree_npz(npz, init, "loftr"), {
            "pretrained": True, "source": str(npz)}
    name = {
        "outdoor": "loftr_outdoor.ckpt",
        "indoor": "loftr_indoor.ckpt",
    }.get(conf.get("weights", "outdoor"), conf.get("weights"))
    path = download_checkpoint(name)
    if path is None:
        # offline fallback: the locally trained dense matcher
        # (homography training — weights/README.md)
        from ...utils.weights import load_tree_npz, local_trained_npz

        local = local_trained_npz("loftr_selftrained.npz")
        if local is not None:
            return load_tree_npz(local, init, "loftr"), {
                "pretrained": True, "source": f"local:{local}"}
        return init, {"pretrained": False}
    sd = load_state_dict(path)
    sd = {k.replace("matcher.", ""): v for k, v in sd.items()}
    tree = _convert_state_dict(sd, init)
    return tree, {"pretrained": True}


def _convert_state_dict(sd, init):
    """Rank-based conversion with BN detection (same scheme as superglue)."""
    import numpy as np

    from ...utils.weights import vec

    tree = {}
    norm_map = {"weight": "scale", "bias": "bias",
                "running_mean": "mean", "running_var": "var"}
    for k, arr in sd.items():
        if k.endswith("num_batches_tracked"):
            continue
        parts = k.split(".")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        leaf = parts[-1]
        prefix = ".".join(parts[:-1])
        if arr.ndim == 4:  # conv
            node["w" if leaf == "weight" else "b"] = vec(
                np.transpose(arr, (2, 3, 1, 0)))
        elif arr.ndim == 2:
            node["w" if leaf == "weight" else "b"] = vec(np.transpose(arr))
        elif f"{prefix}.running_mean" in sd:
            node[norm_map[leaf]] = vec(arr)
        elif leaf in ("weight", "bias") and arr.ndim == 1 and (
            "norm" in parts[-2] if len(parts) > 1 else False
        ):
            node["scale" if leaf == "weight" else "bias"] = vec(arr)
        else:
            node["b" if leaf == "bias" else
                 ("scale" if leaf == "weight" else leaf)] = vec(arr)
    # list-ify transformer layers
    for key in ("loftr_coarse", "loftr_fine"):
        if key in tree and "layers" in tree[key]:
            layers = tree[key]["layers"]
            tree[key]["layers"] = [layers[str(i)]
                                   for i in range(len(layers))]
    return tree


def coarse_match(featc0, featc1, mask0, mask1, temperature=0.1,
                 threshold=0.2, max_matches=1024):
    """Dual-softmax coarse assignment → fixed-M top matches.

    featc0: (L0, d), featc1: (L1, d) flattened coarse grids.
    Returns idx0 (M,), idx1 (M,), conf (M,), valid (M,).
    """
    d = featc0.shape[-1]
    f0 = featc0 / d**0.5
    f1 = featc1 / d**0.5
    sim = jnp.einsum("ld,sd->ls", f0, f1,
                     preferred_element_type=jnp.float32) / temperature
    neg = -1e9
    sim = jnp.where(mask0[:, None] & mask1[None, :], sim, neg)
    # dual-softmax via log-sum-exp, never materialising either softmax:
    #   conf[l,s] = softmax_row(sim)·softmax_col(sim)
    #            = exp(2·sim[l,s] − lse_r[l] − lse_c[s]).
    # The naive product costs ~8 full traversals of the L×S matrix
    # (two softmaxes write+read, the product write, two argmax reads);
    # this form reads sim ~4× and is EXACT up to fp reassociation
    # (r5: LoFTR's coarse grid is 4800×4800 at 640×480 — the dual
    # softmax was ~30% of the pair time, tools/profile_loftr_stages.py).
    lse_r = jax.nn.logsumexp(sim, 1)  # (L,)
    lse_c = jax.nn.logsumexp(sim, 0)  # (S,)
    g_row = 2.0 * sim - lse_c[None, :]
    idx1_of_0 = jnp.argmax(g_row, 1)
    idx0_of_1 = jnp.argmax(2.0 * sim - lse_r[:, None], 0)
    mutual = (jnp.arange(sim.shape[0])
              == jnp.take(idx0_of_1, idx1_of_0))
    score = jnp.exp(jnp.max(g_row, 1) - lse_r)
    ok = mutual & (score > threshold) & mask0
    score = jnp.where(ok, score, 0.0)
    # a small image can have fewer coarse cells than the requested match
    # budget — the shape is static, so clamp at trace time
    max_matches = min(max_matches, score.shape[0])
    top_score, idx0 = jax.lax.top_k(score, max_matches)
    idx1 = jnp.take(idx1_of_0, idx0)
    valid = top_score > 0.0
    return idx0, idx1, top_score, valid


def gather_fine_windows(feat_f, idx, wc, scale=4, window=FINE_WINDOW):
    """Crop window×window fine patches centered at coarse cells.

    feat_f: (Hf, Wf, d); idx: (M,) flat coarse indices; wc: coarse width.
    Coarse cell (i, j) maps to fine center (i·scale + scale/2). Returns
    (M, window², d).
    """
    hf, wf, d = feat_f.shape
    r = window // 2
    ci = idx // wc
    cj = idx % wc
    cy = ci * scale + scale // 2
    cx = cj * scale + scale // 2
    y0 = jnp.clip(cy - r, 0, hf - window)
    x0 = jnp.clip(cx - r, 0, wf - window)

    def crop(y, x):
        return jax.lax.dynamic_slice(feat_f, (y, x, 0), (window, window, d))

    patches = jax.vmap(crop)(y0, x0)
    return patches.reshape(-1, window * window, d)


def fine_match(params, win0, win1, valid):
    """Fine refinement: 1×(self+cross) per window pair, center-vs-window
    correlation, spatial expectation. win*: (M, W², d).
    Returns subpixel offsets for image1 (M, 2) in fine-pixel units."""
    ww = win0.shape[1]
    w = FINE_WINDOW
    layers = params["loftr_fine"]["layers"]

    def per_window(p0, p1):
        for i, layer in enumerate(layers):
            if i % 2 == 0:
                p0 = encoder_layer(layer, p0, p0, nhead=8)
                p1 = encoder_layer(layer, p1, p1, nhead=8)
            else:
                p0n = encoder_layer(layer, p0, p1, nhead=8)
                p1 = encoder_layer(layer, p1, p0, nhead=8)
                p0 = p0n
        center0 = p0[ww // 2]
        # softmax / expectation statistics stay f32 (precision
        # contract); cast AFTER the matvec — an einsum with
        # preferred_element_type here compiled pathologically on
        # XLA:TPU under the window×pair double vmap (r5, wedged >20 min)
        sim = (p1 @ center0).astype(jnp.float32) / (p1.shape[-1] ** 0.5)
        heat = jax.nn.softmax(sim / 0.1)
        grid = jnp.stack(
            [jnp.tile(jnp.arange(w, dtype=jnp.float32), w),
             jnp.repeat(jnp.arange(w, dtype=jnp.float32), w)], -1,
        )  # (W², 2) xy
        expected = (heat[:, None] * grid).sum(0)
        return expected - (w // 2)  # offset around the window center

    offsets = jax.vmap(per_window)(win0, win1)
    return jnp.where(valid[:, None], offsets, 0.0)


def forward_pair(params, image0, image1, mask_wh0, mask_wh1, conf):
    """Single-pair LoFTR forward. image*: (H, W, 1) NHWC in [0,1].
    Returns keypoints0/1 (M, 2) at model resolution, scores (M,),
    mask (M,)."""
    temperature = conf.get("temperature", 0.1)
    threshold = conf.get("match_threshold", 0.2)
    max_matches = conf.get("max_matches", 1024)

    # the param tree's dtype is the precision policy (r5: the f32 path
    # measured 0.08 MFU — BASELINE.md scoreboard; bf16 trunk/transformer
    # with f32 softmax statistics is the same contract as superpoint's
    # precision="bf16")
    dt = params["backbone"]["conv1"]["w"].dtype
    featc, featf = backbone_apply(params["backbone"], jnp.stack(
        [image0, image1], 0).astype(dt))
    hc, wc = featc.shape[1:3]

    pe = position_encoding(hc, wc).astype(featc.dtype)
    fc0 = (featc[0] + pe).reshape(-1, D_COARSE)
    fc1 = (featc[1] + pe).reshape(-1, D_COARSE)

    # coarse-grid validity from the padded-image masks
    def grid_mask(wh):
        ys = jax.lax.broadcasted_iota(jnp.int32, (hc, wc), 0)
        xs = jax.lax.broadcasted_iota(jnp.int32, (hc, wc), 1)
        return ((xs < wh[0] // 8) & (ys < wh[1] // 8)).reshape(-1)

    m0 = grid_mask(mask_wh0)
    m1 = grid_mask(mask_wh1)

    for i, layer in enumerate(params["loftr_coarse"]["layers"]):
        if i % 2 == 0:  # self
            fc0 = encoder_layer(layer, fc0, fc0, mask_src=m0)
            fc1 = encoder_layer(layer, fc1, fc1, mask_src=m1)
        else:  # cross
            fc0n = encoder_layer(layer, fc0, fc1, mask_src=m1)
            fc1 = encoder_layer(layer, fc1, fc0, mask_src=m0)
            fc0 = fc0n

    idx0, idx1, score, valid = coarse_match(
        fc0, fc1, m0, m1, temperature=temperature, threshold=threshold,
        max_matches=max_matches,
    )

    # fine refinement
    down = params["fine_preprocess"]["down_proj"]
    merge = params["fine_preprocess"]["merge_feat"]
    win0 = gather_fine_windows(featf[0], idx0, wc)
    win1 = gather_fine_windows(featf[1], idx1, wc)
    c0 = linear(down, jnp.take(fc0, idx0, axis=0))  # (M, 128)
    c1 = linear(down, jnp.take(fc1, idx1, axis=0))
    win0 = linear(merge, jnp.concatenate(
        [win0, jnp.broadcast_to(c0[:, None], win0.shape)], -1))
    win1 = linear(merge, jnp.concatenate(
        [win1, jnp.broadcast_to(c1[:, None], win1.shape)], -1))
    offsets1 = fine_match(params, win0, win1, valid)  # fine px (1/2 res)

    # keypoints at model resolution
    def cell_center(idx):
        ci = (idx // wc).astype(jnp.float32)
        cj = (idx % wc).astype(jnp.float32)
        return jnp.stack([cj * 8 + 4, ci * 8 + 4], -1)

    kpts0 = cell_center(idx0)
    kpts1 = cell_center(idx1) + offsets1 * 2.0  # fine stride = 2
    kpts0 = jnp.where(valid[:, None], kpts0, 0.0)
    kpts1 = jnp.where(valid[:, None], kpts1, 0.0)
    return {
        "keypoints0": kpts0,
        "keypoints1": kpts1,
        "scores": score,
        "mask": valid,
    }


@functools.partial(jax.jit, static_argnames=("conf_key",))
def _apply_batched(params, image0, image1, wh0, wh1, conf_key):
    conf = dict(conf_key)
    return jax.vmap(
        lambda a, b, c, d: forward_pair(params, a, b, c, d, conf)
    )(image0, image1, wh0, wh1)


class LoFTR(BaseModel):
    """BaseModel wrapper (reference contract:
    imcui/hloc/matchers/loftr.py:12-71 — standalone dense matcher:
    {image0, image1} → {keypoints0, keypoints1, scores/mconf})."""

    default_conf = {
        "weights": "outdoor",
        "match_threshold": 0.2,
        "max_keypoints": 1024,
        "temperature": 0.1,
        # serving precision: bf16 trunk/transformer, f32 softmax and
        # expectation statistics (r5 measured: the all-f32 path ran at
        # 0.08 MFU — BASELINE.md). "fp32" for golden/parity runs.
        "precision": "bf16",
    }
    required_inputs = ["image0", "image1"]

    def _init(self, conf, rng):
        from ..layers import apply_precision

        self.params, self.meta = load_params(conf)
        if conf.get("precision", "bf16") in ("bf16", "bfloat16"):
            self.params = apply_precision(self.params, "bf16")
        mm = conf.get("max_keypoints") or 1024
        self._conf_key = tuple(sorted({
            "match_threshold": float(conf["match_threshold"]),
            "temperature": float(conf["temperature"]),
            "max_matches": int(mm),
        }.items()))

    def _forward(self, data):
        image0 = jnp.asarray(data["image0"], jnp.float32)
        image1 = jnp.asarray(data["image1"], jnp.float32)
        b = image0.shape[0]
        img0 = image0.transpose(0, 2, 3, 1)  # NCHW → NHWC
        img1 = image1.transpose(0, 2, 3, 1)
        if img0.shape[-1] == 3:  # grayscale expected
            img0 = img0.mean(-1, keepdims=True)
            img1 = img1.mean(-1, keepdims=True)

        def wh(key, img):
            if key in data:
                return jnp.asarray(data[key], jnp.int32)
            h, w = img.shape[1:3]
            return jnp.tile(jnp.asarray([[w, h]], jnp.int32), (b, 1))

        out = _apply_batched(
            self.params, img0, img1, wh("size0", img0), wh("size1", img1),
            self._conf_key,
        )
        out["mconf"] = out["scores"]
        return out
