"""SOLD² line detector + matcher, native JAX.

Reference contract: imcui/hloc/matchers/sold2.py:18-144 — standalone line
matcher {image0, image1} → {raw_lines0/1, lines0/1 (matched, xy order)};
the wrapper runs the sold2 LineMatcher (lcnn backbone, superpoint-style
junction decoder, heatmap decoder, descriptor head; detection by sampling
the heatmap along candidate junction pairs; matching by sampled-descriptor
Needleman-Wunsch with cross-check).

TPU-first redesign:
- one shared conv backbone (hourglass-lite) emits the junction heatmap
  (65-way space-to-depth logits), the line heatmap, and a 128-d
  descriptor map in a single jitted forward over BOTH images;
- candidate segments = all pairs of the top-K junctions (fixed K → fixed
  K² candidate matrix); each candidate is scored by bilinear-sampling the
  line heatmap at S points along it (a (K², S) gather) and kept when the
  mean heat + inlier ratio pass detect_thresh — no dynamic shapes;
- matching scores sampled line descriptors with a cross-checked mean-
  similarity vote (the NW alignment's effect at our sample counts) over
  fixed (L, S, C) tensors.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ...utils.base_model import BaseModel
from ...utils.weights import load_params_auto
from ..layers import (batch_norm_inference, conv2d, init_conv, max_pool,
                      relu)

MAX_JUNCTIONS = 64
N_SAMPLES = 8          # heat samples along a candidate segment
N_DESC_SAMPLES = 5     # descriptor samples along a detected line
MAX_LINES = 256
DESC_DIM = 128


def init_bn(c):
    return {"scale": jnp.ones((c,)), "bias": jnp.zeros((c,)),
            "mean": jnp.zeros((c,)), "var": jnp.ones((c,))}


def _cbr(key, cin, cout):
    return {"conv": init_conv(key, 3, 3, cin, cout, bias=False),
            "bn": init_bn(cout)}


def init_params(rng):
    keys = jax.random.split(rng, 12)
    return {
        "trunk": [_cbr(keys[0], 1, 64), _cbr(keys[1], 64, 64),
                  _cbr(keys[2], 64, 128), _cbr(keys[3], 128, 128),
                  _cbr(keys[4], 128, 256), _cbr(keys[5], 256, 256)],
        "junc": init_conv(keys[6], 1, 1, 256, 65),
        "heat": [init_conv(keys[7], 3, 3, 256, 128),
                 init_conv(keys[8], 1, 1, 128, 4)],  # 2×2 s2d heat @ /4
        "desc": [init_conv(keys[9], 3, 3, 256, 256),
                 init_conv(keys[10], 1, 1, 256, DESC_DIM)],
    }


def load_params(conf):
    init = init_params(jax.random.PRNGKey(0))
    return load_params_auto("sold2/" + conf.get("model_name",
                                            "sold2_wireframe.tar"), init, "sold2")


def backbone(params, x):
    """x: (B, H, W, 1) → junctions heat (B, H, W), line heat (B, H/2,
    W/2), desc map (B, H/8, W/8, 128)."""
    feats = x
    for i, p in enumerate(params["trunk"]):
        feats = relu(batch_norm_inference(p["bn"],
                                          conv2d(p["conv"], feats)))
        if i in (1, 3):
            feats = max_pool(feats)
    f8 = max_pool(feats)  # /8 for descriptors

    # junction decoder (65-way s2d over the /8 grid → full-res heat)
    logits = conv2d(params["junc"], f8)
    prob = jax.nn.softmax(logits, -1)[..., :64]
    b, hc, wc, _ = prob.shape
    junc = prob.reshape(b, hc, wc, 8, 8).transpose(0, 1, 3, 2, 4)
    junc = junc.reshape(b, hc * 8, wc * 8)

    # line heatmap decoder at /2 (2×2 s2d from the /4 trunk features)
    heat_log = conv2d(params["heat"][1],
                      relu(conv2d(params["heat"][0], feats)))
    hb, hh, hw, _ = heat_log.shape
    heat = jax.nn.sigmoid(heat_log).reshape(hb, hh, hw, 2, 2)
    heat = heat.transpose(0, 1, 3, 2, 4).reshape(hb, hh * 2, hw * 2)

    desc = conv2d(params["desc"][1], relu(conv2d(params["desc"][0], f8)))
    desc = desc / jnp.maximum(
        jnp.linalg.norm(desc, axis=-1, keepdims=True), 1e-8)
    return junc, heat, desc


def _bilinear(hmap, xy):
    h, w = hmap.shape
    x = jnp.clip(xy[..., 0], 0.0, w - 1.001)
    y = jnp.clip(xy[..., 1], 0.0, h - 1.001)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx = x - x0
    fy = y - y0
    return (hmap[y0, x0] * (1 - fx) * (1 - fy)
            + hmap[y0, x0 + 1] * fx * (1 - fy)
            + hmap[y0 + 1, x0] * (1 - fx) * fy
            + hmap[y0 + 1, x0 + 1] * fx * fy)


def detect_lines_single(junc, heat, detect_thresh, valid_thresh,
                        min_len=8.0):
    """Fixed-shape line detection: top-K junctions → K² candidates scored
    on the /1 line heatmap. Returns lines (MAX_LINES, 2, 2), scores, valid.
    """
    from ...ops import nms as nms_ops

    h, w = junc.shape
    s = nms_ops.simple_nms(junc, 3)
    kpts, kscores, kmask = nms_ops.select_topk_keypoints(
        s, MAX_JUNCTIONS, 0.0)
    # candidate segments: upper-triangle junction pairs
    ii, jj = jnp.triu_indices(MAX_JUNCTIONS, k=1)
    p0 = kpts[ii]  # (P, 2)
    p1 = kpts[jj]
    t = jnp.linspace(0.0, 1.0, N_SAMPLES)[None, :, None]
    pts = p0[:, None] + (p1 - p0)[:, None] * t       # (P, S, 2)
    # heatmap lives at /1 after s2d (same res as junc/2 — upsampled grid)
    heat_xy = pts * (jnp.asarray(heat.shape[::-1], jnp.float32)
                     / jnp.asarray([w, h], jnp.float32))
    samples = _bilinear(heat, heat_xy)               # (P, S)
    mean_heat = samples.mean(-1)
    inlier = (samples > valid_thresh).mean(-1)
    length = jnp.linalg.norm(p1 - p0, axis=-1)
    ok = (mean_heat > detect_thresh) & (inlier > 0.75) \
        & (length > min_len) & kmask[ii] & kmask[jj]
    score = jnp.where(ok, mean_heat, 0.0)
    top, sel = jax.lax.top_k(score, MAX_LINES)
    lines = jnp.stack([p0[sel], p1[sel]], 1)         # (L, 2, 2) xy
    return lines, top, top > 0.0


def sample_line_desc(desc_map, lines):
    """desc_map: (Hc, Wc, C) at /8; lines: (L, 2, 2) px →
    (L, S, C) L2-normalised."""
    t = jnp.linspace(0.05, 0.95, N_DESC_SAMPLES)[None, :, None]
    pts = lines[:, None, 0] + (lines[:, 1] - lines[:, 0])[:, None] * t
    d = jax.vmap(lambda p: _bilinear_vec(desc_map, p))(pts / 8.0)
    return d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True),
                           1e-8)


def _bilinear_vec(fmap, xy):
    h, w, c = fmap.shape
    x = jnp.clip(xy[..., 0], 0.0, w - 1.001)
    y = jnp.clip(xy[..., 1], 0.0, h - 1.001)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    return (fmap[y0, x0] * (1 - fx) * (1 - fy)
            + fmap[y0, x0 + 1] * fx * (1 - fy)
            + fmap[y0 + 1, x0] * (1 - fx) * fy
            + fmap[y0 + 1, x0 + 1] * fx * fy)


def match_lines(d0, d1, v0, v1):
    """Cross-checked line matching on sampled descriptors.
    d*: (L, S, C). Mean of the best per-sample similarity, both segment
    directions (lines are unoriented). Returns matches (L0,), scores."""
    # direction-invariant: compare forward and reversed sample order
    simf = jnp.einsum("lsc,mtc->lmst", d0, d1,
                      preferred_element_type=jnp.float32)
    diag_f = jnp.einsum("lmss->lms", simf).mean(-1)
    diag_r = jnp.einsum("lmss->lms", simf[..., ::-1]).mean(-1)
    sim = jnp.maximum(diag_f, diag_r)  # (L0, L1)
    sim = jnp.where(v0[:, None] & v1[None, :], sim, -1e9)
    nn01 = jnp.argmax(sim, 1)
    nn10 = jnp.argmax(sim, 0)
    mutual = jnp.arange(sim.shape[0]) == jnp.take(nn10, nn01)
    score = jnp.max(sim, 1)
    ok = mutual & v0 & (score > 0.0)
    return jnp.where(ok, nn01, -1).astype(jnp.int32), \
        jnp.where(ok, score, 0.0)


@functools.partial(jax.jit,
                   static_argnames=("detect_thresh", "valid_thresh"))
def apply_pair(params, image0, image1, detect_thresh=0.25,
               valid_thresh=1e-3):
    x = jnp.stack([image0, image1], 0)
    junc, heat, desc = backbone(params, x)
    l0, s0, v0 = detect_lines_single(junc[0], heat[0], detect_thresh,
                                     valid_thresh)
    l1, s1, v1 = detect_lines_single(junc[1], heat[1], detect_thresh,
                                     valid_thresh)
    d0 = sample_line_desc(desc[0], l0)
    d1 = sample_line_desc(desc[1], l1)
    matches, mscores = match_lines(d0, d1, v0, v1)
    return l0, l1, v0, v1, matches, mscores


class SOLD2(BaseModel):
    """Reference contract: imcui/hloc/matchers/sold2.py:18 — line
    detection + matching; outputs raw_lines0/1 and matched lines0/1."""

    default_conf = {
        "model_name": "sold2_wireframe.tar",
        "match_threshold": 0.2,
        "detect_thresh": 0.25,
        "multiscale": False,
        "valid_thresh": 1e-3,
        "num_blocks": 20,
        "overlap_ratio": 0.5,
    }
    required_inputs = ["image0", "image1"]

    def _init(self, conf, rng):
        self.params, self.meta = load_params(conf)

    def _forward(self, data):
        image0 = jnp.asarray(data["image0"], jnp.float32)
        image1 = jnp.asarray(data["image1"], jnp.float32)

        def gray(img):
            x = img[0]
            return x.mean(0)[..., None] if x.shape[0] == 3 \
                else x[0][..., None]

        l0, l1, v0, v1, matches, mscores = apply_pair(
            self.params, gray(image0), gray(image1),
            detect_thresh=float(self.conf["detect_thresh"]),
            valid_thresh=float(self.conf["valid_thresh"]))
        l0 = np.asarray(l0)
        l1 = np.asarray(l1)
        v0 = np.asarray(v0)
        v1 = np.asarray(v1)
        matches = np.asarray(matches)
        mscores = np.asarray(mscores)

        raw0 = l0[v0]
        raw1 = l1[v1]
        ok = matches > -1
        ml0 = l0[ok]
        ml1 = l1[np.clip(matches[ok], 0, max(len(l1) - 1, 0))] \
            if ok.any() else np.zeros((0, 2, 2), np.float32)
        mid0 = ml0.mean(1) if len(ml0) else np.zeros((0, 2), np.float32)
        mid1 = ml1.mean(1) if len(ml1) else np.zeros((0, 2), np.float32)
        return {
            "raw_lines0": raw0,
            "raw_lines1": raw1,
            "lines0": ml0,
            "lines1": ml1,
            "line_keypoints0": mid0,
            "line_keypoints1": mid1,
            "keypoints0": mid0,
            "keypoints1": mid1,
            "mconf": mscores[ok],
            "line_scores": mscores[ok],
        }
