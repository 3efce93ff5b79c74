"""LightGlue attentional matcher, native JAX/XLA.

Re-implementation of the architecture behind the reference wrapper
(reference: imcui/hloc/matchers/lightglue.py:14-75; the network lives in the
``lightglue`` package upstream — rebuilt here from the published
architecture: learnable-Fourier rotary positional encoding, L layers of
self + bidirectional-cross attention, sigmoid-matchability double-softmax
assignment head).

TPU-first redesign decisions (SURVEY §7.3):
- **Adaptive depth, TPU-shaped.** The torch original exits early when
  token confidence saturates (``depth_confidence=0.95``). Here that is a
  ``lax.while_loop`` over stacked layer params (forward_pair_adaptive):
  fixed shapes, one executable, dynamic trip count; a vmapped batch exits
  when every pair is confident. ``width_confidence`` point pruning stays
  a documented no-op — pruning shrinks shapes (a recompile per pair on
  TPU) and the masked fixed-shape design already bounds its cost. The
  fused serving path (pipeline/two_view.py) keeps static depth so the
  benchmark measures a fixed workload.
- **Masked fixed shapes.** Padded keypoint slots carry an additive -inf
  attention mask and zero mass in the assignment, so one executable serves
  every keypoint count ≤ the bucket; whole pair-batches go through a
  single vmapped forward.
- Self- and cross-attention logits/readout run on the MXU in bf16-friendly
  einsums; the (N0, N1) cross logits are computed once and softmaxed along
  both axes (the bidirectional-attention trick from the paper).

Weight conversion: torch state_dict paths (input_proj, posenc.Wr,
transformers.{i}.self_attn.Wqkv/out_proj/ffn.*, transformers.{i}.cross_attn
.to_qk/to_v/to_out/ffn.*, log_assignment.{i}.matchability/final_proj) map
1:1 onto the param tree.
"""

import functools

import jax
import jax.numpy as jnp

from ...ops.attention import (NEG_INF, apply_rotary,
                              bidirectional_attention, flash_attention,
                              fused_attention_small,
                              learnable_fourier_encoding, mha)
from ...utils.base_model import BaseModel
from ...utils.weights import (assert_tree_matches, download_checkpoint,
                              load_state_dict, state_dict_to_tree)
from ..layers import gelu, init_layer_norm, init_linear, layer_norm, linear

FEATURE_DIMS = {
    "superpoint": 256,
    "disk": 128,
    "aliked": 128,
    "raco-aliked": 128,  # RaCo keypoints described by ALIKED's SDDH
    "sift": 128,
    "xfeat": 64,
}


def init_ffn(key, dim):
    k1, k2 = jax.random.split(key)
    return {
        "0": init_linear(k1, 2 * dim, 2 * dim),
        "1": init_layer_norm(2 * dim),
        "3": init_linear(k2, 2 * dim, dim),
    }


def ffn_apply(p, x, message):
    h = jnp.concatenate([x, message], -1)
    h = linear(p["0"], h)
    h = layer_norm(p["1"], h)
    h = gelu(h)
    return linear(p["3"], h)


def init_params(rng, conf):
    dim = conf["descriptor_dim"]
    n_layers = conf["n_layers"]
    input_dim = FEATURE_DIMS.get(conf["features"], dim)
    pos_dim = 2 + (2 if conf.get("add_scale_ori") else 0)
    head_dim = dim // conf["num_heads"]
    keys = jax.random.split(rng, 2 + n_layers)
    params = {
        "input_proj": init_linear(keys[0], input_dim, dim),
        "posenc": {
            "Wr": {"w": jax.random.normal(keys[1], (pos_dim, head_dim // 2))
                   .astype(jnp.float32)}
        },
        "transformers": [],
        # upstream keeps one assignment head per layer (adaptive depth
        # exits through the head of the layer it stopped at) and a token
        # confidence head after every layer but the last
        "log_assignment": [],
        "token_confidence": [],
    }
    for i in range(n_layers):
        k = jax.random.split(keys[2 + i], 11)
        params["transformers"].append(
            {
                "self_attn": {
                    "Wqkv": init_linear(k[0], dim, 3 * dim),
                    "out_proj": init_linear(k[1], dim, dim),
                    "ffn": init_ffn(k[2], dim),
                },
                "cross_attn": {
                    "to_qk": init_linear(k[3], dim, dim),
                    "to_v": init_linear(k[4], dim, dim),
                    "to_out": init_linear(k[5], dim, dim),
                    "ffn": init_ffn(k[6], dim),
                },
            }
        )
        params["log_assignment"].append({
            "matchability": init_linear(k[7], dim, 1),
            "final_proj": init_linear(k[8], dim, dim),
        })
        if i < n_layers - 1:
            params["token_confidence"].append(
                {"token": init_linear(k[9], dim, 1)})
    return params


def load_params(conf):
    init = init_params(jax.random.PRNGKey(0), conf)
    npz = conf.get("checkpoint_npz")
    if npz:
        # locally trained tree (tools/train_lightglue.py output via
        # utils.weights.save_tree_npz) — the training subsystem's trees
        # are the serving trees, no conversion needed
        from ...utils.weights import load_tree_npz
        return load_tree_npz(npz, init, "lightglue"), {
            "pretrained": True, "source": str(npz)}
    path = download_checkpoint(conf.get("model_name", "superpoint_lightglue.pth"))
    if path is None:
        # offline fallback: the locally trained matcher (homography
        # pre-training on SuperPoint features — weights/README.md).
        # Only the superpoint feature mode at the trained depth matches
        # the tree shape; other modes keep the pre-r5 random init.
        from ...utils.weights import load_tree_npz, local_trained_npz

        local = (local_trained_npz("lightglue_selftrained.npz")
                 if conf.get("features") == "superpoint"
                 and conf["n_layers"] == 9 else None)
        if local is not None:
            return load_tree_npz(local, init, "lightglue"), {
                "pretrained": True, "source": f"local:{local}"}
        return init, {"pretrained": False}
    sd = load_state_dict(path)
    n_layers = conf["n_layers"]
    # token_confidence.{i}.token.0 is the Linear inside the Sequential
    # (index 1 is the param-free Sigmoid); real checkpoints carry
    # n_layers-1 heads — ignore any extras a synthetic sd might add
    sd = {
        k.replace(".token.0.", ".token."): v
        for k, v in sd.items()
        if not k.startswith(f"token_confidence.{n_layers - 1}.")
    }
    tree = state_dict_to_tree(
        sd,
        [
            (r".*posenc\.Wr", "linear"),
            (r".*\.ffn\.1\.", "norm"),
            (r".*", "linear"),
        ],
    )
    # list-ify the per-layer module dicts
    tree["transformers"] = [
        tree["transformers"][str(i)] for i in range(n_layers)]
    tree["log_assignment"] = [
        tree["log_assignment"][str(i)] for i in range(n_layers)]
    tc = tree.get("token_confidence", {})
    # pre-adaptive checkpoints may lack confidence heads: fall back to
    # the (random) init heads so static-depth inference stays usable;
    # adaptive depth then simply never fires early.
    tree["token_confidence"] = [
        tc.get(str(i), init["token_confidence"][i])
        for i in range(n_layers - 1)]
    assert_tree_matches(tree, init, "lightglue")
    return tree, {"pretrained": True}


def normalize_keypoints(kpts, size_wh):
    """Center + scale keypoints into ~[-1, 1] (LightGlue convention)."""
    size = size_wh.astype(jnp.float32)
    shift = size / 2.0
    scale = jnp.max(size, axis=-1, keepdims=True) / 2.0
    return (kpts - shift[None, :]) / scale[None, :]


def _heads(x, num_heads):
    n, d = x.shape
    return x.reshape(n, num_heads, d // num_heads).transpose(1, 0, 2)


def _merge(x):
    h, n, dh = x.shape
    return x.transpose(1, 0, 2).reshape(n, h * dh)


def self_block(p, x, enc, mask, num_heads):
    qkv = linear(p["Wqkv"], x)  # (N, 3D)
    n, d = x.shape
    # torch packing: unflatten(-1, (heads, dh, 3)) — qkv triple innermost
    qkv = qkv.reshape(n, num_heads, d // num_heads, 3)
    q = qkv[..., 0].transpose(1, 0, 2)  # (H, N, Dh)
    k = qkv[..., 1].transpose(1, 0, 2)
    v = qkv[..., 2].transpose(1, 0, 2)
    q = apply_rotary(q, enc)
    k = apply_rotary(k, enc)
    # single-shot VMEM attention at serving sizes (≤2048 kpts, logits
    # never touch HBM); blockwise Pallas beyond; XLA fallback elsewhere
    if k.shape[1] <= 2048:
        ctx = fused_attention_small(q, k, v, mask)
    else:
        ctx = flash_attention(q, k, v, mask)
    message = linear(p["out_proj"], _merge(ctx))
    return x + ffn_apply(p["ffn"], x, message)


def cross_block(p, x0, x1, mask0, mask1, num_heads):
    qk0 = _heads(linear(p["to_qk"], x0), num_heads)
    qk1 = _heads(linear(p["to_qk"], x1), num_heads)
    v0 = _heads(linear(p["to_v"], x0), num_heads)
    v1 = _heads(linear(p["to_v"], x1), num_heads)
    # one logits tensor, softmaxed along both axes (bidirectional);
    # VMEM-resident Pallas kernel at serving sizes, XLA fallback inside
    m0, m1 = bidirectional_attention(qk0, qk1, v0, v1, mask0, mask1)
    m0 = linear(p["to_out"], _merge(m0))
    m1 = linear(p["to_out"], _merge(m1))
    x0 = x0 + ffn_apply(p["ffn"], x0, m0)
    x1 = x1 + ffn_apply(p["ffn"], x1, m1)
    return x0, x1


def sigmoid_log_double_softmax(sim, z0, z1, mask0, mask1):
    """LightGlue assignment: log P = logsoftmax_rows + logsoftmax_cols +
    logsigmoid(z0) + logsigmoid(z1). Returns (N0+1, N1+1) log scores with
    unmatchable mass on the dustbins."""
    m, n = sim.shape
    sim = jnp.where(mask0[:, None] & mask1[None, :], sim, NEG_INF)
    certainties = jax.nn.log_sigmoid(z0)[:, None] + jax.nn.log_sigmoid(z1)[None, :]
    scores0 = jax.nn.log_softmax(sim, axis=1)
    scores1 = jax.nn.log_softmax(sim, axis=0)
    scores = jnp.full((m + 1, n + 1), 0.0, sim.dtype)
    scores = scores.at[:m, :n].set(scores0 + scores1 + certainties)
    scores = scores.at[:m, n].set(jax.nn.log_sigmoid(-z0))
    scores = scores.at[m, :n].set(jax.nn.log_sigmoid(-z1))
    return scores


def assignment(p, desc0, desc1, mask0, mask1):
    d = desc0.shape[-1]
    mdesc0 = linear(p["final_proj"], desc0) / d**0.25
    mdesc1 = linear(p["final_proj"], desc1) / d**0.25
    sim = jnp.einsum("nd,md->nm", mdesc0, mdesc1,
                     preferred_element_type=jnp.float32)
    z0 = linear(p["matchability"], desc0)[:, 0]
    z1 = linear(p["matchability"], desc1)[:, 0]
    return sigmoid_log_double_softmax(sim, z0, z1, mask0, mask1)


def filter_matches(scores, threshold, mask0, mask1):
    """Mutual-argmax decoding over exp(scores) (LightGlue convention)."""
    probs = jnp.exp(scores[:-1, :-1])
    probs = jnp.where(mask0[:, None] & mask1[None, :], probs, 0.0)
    idx0 = jnp.argmax(probs, axis=1)
    idx1 = jnp.argmax(probs, axis=0)
    m = probs.shape[0]
    mutual = jnp.arange(m) == jnp.take(idx1, idx0)
    mscores = jnp.max(probs, axis=1)
    valid = mutual & (mscores > threshold) & mask0
    matches0 = jnp.where(valid, idx0, -1).astype(jnp.int32)
    return matches0, jnp.where(valid, mscores, 0.0)


def forward_pair(params, kpts0, kpts1, desc0, desc1, mask0, mask1,
                 size0, size1, conf):
    """Single-pair forward (unbatched); vmap for pair batches.

    conf["precision"]="bf16" runs the transformer stack in bfloat16
    (softmax logits and all matmul accumulations stay f32, and the final
    assignment head runs f32) — ~2.5× on the MXU at serving shapes. The
    default is fp32 for golden-parity runs; the serving hot path
    (pipeline/two_view.py) selects bf16.
    """
    num_heads = conf["num_heads"]
    bf16 = conf.get("precision") == "bf16"
    tparams = params
    if bf16:
        tparams = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16), params)
        desc0 = desc0.astype(jnp.bfloat16)
        desc1 = desc1.astype(jnp.bfloat16)
    x0 = linear(tparams["input_proj"], desc0)
    x1 = linear(tparams["input_proj"], desc1)
    p0 = normalize_keypoints(kpts0[:, :2], size0)
    p1 = normalize_keypoints(kpts1[:, :2], size1)
    if conf.get("add_scale_ori"):
        p0 = jnp.concatenate([p0, kpts0[:, 2:4]], -1)
        p1 = jnp.concatenate([p1, kpts1[:, 2:4]], -1)
    # rotary frequencies always come from the f32 weights (sin/cos of a
    # bf16-rounded projection would shift phases); the applied cos/sin are
    # then cast to the compute dtype
    enc0 = learnable_fourier_encoding(p0, params["posenc"]["Wr"]["w"])
    enc1 = learnable_fourier_encoding(p1, params["posenc"]["Wr"]["w"])
    if bf16:
        enc0 = tuple(e.astype(jnp.bfloat16) for e in enc0)
        enc1 = tuple(e.astype(jnp.bfloat16) for e in enc1)

    for layer in tparams["transformers"]:
        x0 = self_block(layer["self_attn"], x0, enc0, mask0, num_heads)
        x1 = self_block(layer["self_attn"], x1, enc1, mask1, num_heads)
        x0, x1 = cross_block(layer["cross_attn"], x0, x1, mask0, mask1,
                             num_heads)

    if bf16:  # assignment head in f32 for crisp match thresholds
        x0 = x0.astype(jnp.float32)
        x1 = x1.astype(jnp.float32)
    scores = assignment(params["log_assignment"][-1], x0, x1, mask0, mask1)
    matches0, mscores0 = filter_matches(
        scores, conf["match_threshold"], mask0, mask1
    )
    return {"matches0": matches0, "matching_scores0": mscores0}


def _stack_trees(trees):
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *trees)


def _index_tree(stk, i):
    return jax.tree_util.tree_map(
        lambda s: jax.lax.dynamic_index_in_dim(s, i, 0, keepdims=False),
        stk)


def forward_pair_adaptive(params, kpts0, kpts1, desc0, desc1, mask0, mask1,
                          size0, size1, conf):
    """Adaptive-depth forward (reference parity: the upstream network
    exits early once ``depth_confidence`` of the tokens saturate their
    per-layer confidence threshold, reading the assignment from the head
    of the layer it stopped at).

    TPU-native shape: a ``lax.while_loop`` over STACKED layer params —
    fixed shapes, one executable, dynamic trip count. Under ``vmap`` the
    loop runs until every pair in the batch has exited, which is exactly
    the batch-coupled semantics a TPU serving batch wants. The upstream
    ``width_confidence`` point pruning is still a no-op here: pruning
    shrinks shapes (recompilation per pair on TPU) and only speeds up the
    pruned tail, which the masked fixed-shape design already bounds.
    """
    num_heads = conf["num_heads"]
    n_layers = len(params["transformers"])
    depth_conf = float(conf.get("depth_confidence", 0.95) or 0)
    if n_layers < 2 or depth_conf <= 0:
        return forward_pair(params, kpts0, kpts1, desc0, desc1, mask0,
                            mask1, size0, size1, conf)
    bf16 = conf.get("precision") == "bf16"
    tparams = params
    if bf16:
        tparams = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16), params)
        desc0 = desc0.astype(jnp.bfloat16)
        desc1 = desc1.astype(jnp.bfloat16)
    x0 = linear(tparams["input_proj"], desc0)
    x1 = linear(tparams["input_proj"], desc1)
    p0 = normalize_keypoints(kpts0[:, :2], size0)
    p1 = normalize_keypoints(kpts1[:, :2], size1)
    if conf.get("add_scale_ori"):
        p0 = jnp.concatenate([p0, kpts0[:, 2:4]], -1)
        p1 = jnp.concatenate([p1, kpts1[:, 2:4]], -1)
    enc0 = learnable_fourier_encoding(p0, params["posenc"]["Wr"]["w"])
    enc1 = learnable_fourier_encoding(p1, params["posenc"]["Wr"]["w"])
    if bf16:
        enc0 = tuple(e.astype(jnp.bfloat16) for e in enc0)
        enc1 = tuple(e.astype(jnp.bfloat16) for e in enc1)

    stk_t = _stack_trees(tparams["transformers"])
    stk_c = _stack_trees(params["token_confidence"])     # f32 heads
    # upstream per-layer confidence threshold schedule
    import math
    ths = jnp.asarray([
        min(max(0.8 + 0.1 * math.exp(-4.0 * i / n_layers), 0.0), 1.0)
        for i in range(n_layers)], jnp.float32)
    npts = jnp.maximum(mask0.sum() + mask1.sum(), 1).astype(jnp.float32)

    def cond(st):
        i, _, _, done = st
        return (i < n_layers) & ~done

    def body(st):
        i, x0, x1, _ = st
        lyr = _index_tree(stk_t, i)
        x0 = self_block(lyr["self_attn"], x0, enc0, mask0, num_heads)
        x1 = self_block(lyr["self_attn"], x1, enc1, mask1, num_heads)
        x0, x1 = cross_block(lyr["cross_attn"], x0, x1, mask0, mask1,
                             num_heads)
        tc = _index_tree(stk_c, jnp.minimum(i, n_layers - 2))
        c0 = jax.nn.sigmoid(
            linear(tc["token"], x0.astype(jnp.float32)))[:, 0]
        c1 = jax.nn.sigmoid(
            linear(tc["token"], x1.astype(jnp.float32)))[:, 0]
        th = ths[i]
        n_unconf = (jnp.where(mask0, c0 < th, False).sum()
                    + jnp.where(mask1, c1 < th, False).sum())
        ratio = 1.0 - n_unconf.astype(jnp.float32) / npts
        done = (ratio > depth_conf) & (i < n_layers - 1)
        return (i + 1, x0, x1, done)

    i0 = jnp.asarray(0, jnp.int32)
    i_end, x0, x1, _ = jax.lax.while_loop(
        cond, body, (i0, x0, x1, jnp.asarray(False)))

    if bf16:
        x0 = x0.astype(jnp.float32)
        x1 = x1.astype(jnp.float32)
    head = _index_tree(_stack_trees(params["log_assignment"]), i_end - 1)
    scores = assignment(head, x0, x1, mask0, mask1)
    matches0, mscores0 = filter_matches(
        scores, conf["match_threshold"], mask0, mask1
    )
    return {"matches0": matches0, "matching_scores0": mscores0,
            "stop_layer": i_end}


@functools.partial(jax.jit, static_argnames=("conf_key",))
def _apply_batched(params, kpts0, kpts1, desc0, desc1, mask0, mask1,
                   size0, size1, conf_key):
    conf = dict(conf_key)
    base = (forward_pair_adaptive
            if conf.get("depth_confidence", 0) else forward_pair)
    fn = functools.partial(base, conf=conf)
    return jax.vmap(
        lambda a, b, c, d, e, f, g, h: fn(params, a, b, c, d, e, f, g, h)
    )(kpts0, kpts1, desc0, desc1, mask0, mask1, size0, size1)


class LightGlue(BaseModel):
    """BaseModel wrapper (reference contract:
    imcui/hloc/matchers/lightglue.py:14-75)."""

    default_conf = {
        "features": "superpoint",
        "model_name": "superpoint_lightglue.pth",
        "descriptor_dim": 256,
        "num_heads": 4,
        "n_layers": 9,
        "match_threshold": 0.2,
        "add_scale_ori": False,
        # depth_confidence drives the while_loop early exit
        # (forward_pair_adaptive); width_confidence is accepted for
        # reference API parity and documented as a no-op:
        "depth_confidence": 0.95,
        "width_confidence": 0.99,
        "flash": True,
    }
    required_inputs = [
        "keypoints0", "keypoints1", "descriptors0", "descriptors1",
    ]

    def _init(self, conf, rng):
        if conf["features"] in ("disk", "aliked", "raco-aliked", "sift",
                                "xfeat"):
            conf.setdefault("input_dim", FEATURE_DIMS[conf["features"]])
        self.params, self.meta = load_params(conf)
        self._conf_key = tuple(
            sorted(
                {
                    "features": conf["features"],
                    "num_heads": conf["num_heads"],
                    "match_threshold": float(conf["match_threshold"]),
                    "add_scale_ori": bool(conf["add_scale_ori"]),
                    "depth_confidence": float(
                        conf.get("depth_confidence") or 0),
                }.items()
            )
        )

    def _forward(self, data):
        kpts0 = jnp.asarray(data["keypoints0"], jnp.float32)
        kpts1 = jnp.asarray(data["keypoints1"], jnp.float32)
        if self.conf["add_scale_ori"]:
            # append per-keypoint scale + orientation columns (SIFT mode)
            def with_so(kpts, scales, oris):
                s = jnp.asarray(scales, jnp.float32)[..., None]
                o = jnp.asarray(oris, jnp.float32)[..., None]
                return jnp.concatenate([kpts[..., :2], s, o], -1)

            kpts0 = with_so(kpts0, data["scales0"], data["oris0"])
            kpts1 = with_so(kpts1, data["scales1"], data["oris1"])
        desc0 = jnp.asarray(data["descriptors0"], jnp.float32)
        desc1 = jnp.asarray(data["descriptors1"], jnp.float32)
        if desc0.shape[1] != kpts0.shape[1]:  # (B, D, N) → (B, N, D)
            desc0 = desc0.transpose(0, 2, 1)
        if desc1.shape[1] != kpts1.shape[1]:
            desc1 = desc1.transpose(0, 2, 1)
        b, n0 = kpts0.shape[:2]
        n1 = kpts1.shape[1]
        mask0 = jnp.asarray(data.get("mask0", jnp.ones((b, n0), bool)), bool)
        mask1 = jnp.asarray(data.get("mask1", jnp.ones((b, n1), bool)), bool)

        def sizes(key_img, key_wh, kpts):
            if key_wh in data:
                return jnp.asarray(data[key_wh], jnp.float32)
            img = data.get(key_img)
            if img is not None and hasattr(img, "shape") and len(img.shape) == 4:
                h, w = img.shape[-2:]
                return jnp.tile(jnp.asarray([[w, h]], jnp.float32), (b, 1))
            # fall back to keypoint extent
            return jnp.max(kpts[..., :2], axis=1) + 1.0

        size0 = sizes("image0", "size0", kpts0)
        size1 = sizes("image1", "size1", kpts1)
        return _apply_batched(
            self.params, kpts0, kpts1, desc0, desc1, mask0, mask1,
            size0, size1, self._conf_key,
        )
