"""Point + line matching (GlueStick-family contract).

Reference contract: imcui/hloc/matchers/gluestick.py:16-99 — a wireframe
extractor (SuperPoint keypoints + pytlsd line segments) feeding a GNN that
returns BOTH keypoint matches and line matches; the dense UI path consumes
{lines0, lines1, raw_lines0/1, line_keypoints0/1}
(imcui/hloc/match_dense.py:687-721).

Implementation scope: OpenCV LSD line segments (pytlsd's role; Canny+
Hough fallback), SuperPoint keypoints + descriptors, and TWO matching
paths —
1. the default handcrafted path: on-device mutual-NN keypoint matching +
   line matching by descriptor voting along sampled line points (robust
   with any descriptor quality, used when no GlueStick checkpoint is
   reachable), and
2. the GlueStick GNN (``gnn_forward`` below): the published joint
   point+line attention design rebuilt natively — keypoints and the 2L
   line ENDPOINTS share one token set; layers alternate self-attention,
   line message passing (each endpoint exchanges features with its line's
   other endpoint — the wireframe connectivity), and cross-image
   attention; points decode through a Sinkhorn assignment and lines from
   their endpoints' pairwise similarities (both orientations). It engages
   when pretrained weights load (``use_gnn`` conf overrides) — an
   untrained GNN scrambles descriptors, so the voting path is the honest
   offline default.

TPU-first: the token count is static (N kpts + 2·L endpoints, masked);
line message passing is one gather+swap; everything jits to one
executable per shape bucket.
"""

import functools

import cv2
import jax
import jax.numpy as jnp
import numpy as np

from ...utils.base_model import BaseModel

N_LINE_SAMPLES = 5
D_MODEL = 256
N_GNN_LAYERS = 9
NHEAD = 4


def detect_lines(gray_u8, max_lines=512, min_length=15.0):
    """Line segments (the pytlsd analog): LSD when the OpenCV build ships
    it, else Canny + probabilistic Hough. Returns (L, 2, 2) xy."""
    lines = None
    try:
        lsd = cv2.createLineSegmentDetector()
        out = lsd.detect(gray_u8)
        lines = out[0] if out is not None else None
    except cv2.error:
        lines = None
    if lines is None:  # LSD stubbed in some builds (patent era)
        edges = cv2.Canny(gray_u8, 50, 150)
        hough = cv2.HoughLinesP(
            edges, 1, np.pi / 180, threshold=40,
            minLineLength=int(min_length), maxLineGap=4,
        )
        lines = hough.astype(np.float32) if hough is not None else None
    if lines is None or len(lines) == 0:
        return np.zeros((0, 2, 2), np.float32)
    lines = lines.reshape(-1, 4)
    lengths = np.linalg.norm(lines[:, 2:] - lines[:, :2], axis=1)
    keep = lengths >= min_length
    lines = lines[keep]
    lengths = lengths[keep]
    order = np.argsort(-lengths)[:max_lines]
    return lines[order].reshape(-1, 2, 2).astype(np.float32)


def sample_line_points(lines, n=N_LINE_SAMPLES):
    """(L, 2, 2) → (L, n, 2) points uniformly spaced along each segment."""
    t = np.linspace(0.0, 1.0, n)[None, :, None]
    p0 = lines[:, None, 0]
    p1 = lines[:, None, 1]
    return p0 + (p1 - p0) * t


def describe_points(desc_map, pts, stride=8):
    """Bilinear-sample a descriptor map (C, Hc, Wc) at image points."""
    import jax.numpy as jnp

    from ...ops.nms import sample_descriptors

    flat = pts.reshape(-1, 2)
    d = np.asarray(sample_descriptors(
        jnp.asarray(flat), jnp.asarray(desc_map), s=stride))
    return d.T.reshape(*pts.shape[:-1], -1)  # (..., C)


def match_lines(desc0, desc1, min_votes=3):
    """Descriptor voting: lines match when ≥min_votes of their sampled
    points mutually nearest-neighbour each other. desc*: (L, S, C)."""
    if len(desc0) == 0 or len(desc1) == 0:
        return np.full(len(desc0), -1, np.int32)
    l0, s, c = desc0.shape
    a = desc0.reshape(-1, c)
    b = desc1.reshape(-1, c)
    sim = a @ b.T
    nn01 = sim.argmax(1)
    nn10 = sim.argmax(0)
    mutual = np.arange(len(a)) == nn10[nn01]
    votes = np.zeros((l0, len(desc1)), np.int32)
    for i in range(l0):
        for k in range(s):
            idx = i * s + k
            if mutual[idx]:
                votes[i, nn01[idx] // s] += 1
    best = votes.argmax(1)
    ok = votes[np.arange(l0), best] >= min_votes
    return np.where(ok, best, -1).astype(np.int32)


# ---------------------------------------------------------------------------
# GlueStick GNN (joint point + line-endpoint attention)
# ---------------------------------------------------------------------------

def init_gnn_params(rng):
    from ..layers import init_linear

    keys = jax.random.split(rng, 4 + 3 * N_GNN_LAYERS)
    params = {
        "kenc": {"0": init_linear(keys[0], 3, 64),
                 "1": init_linear(keys[1], 64, D_MODEL)},
        "line_flag": jax.random.normal(keys[2], (2, D_MODEL)) * 0.02,
        "layers": [],
        "bin_score": jnp.asarray(1.0),
    }
    for i in range(N_GNN_LAYERS):
        k1, k2, k3 = jax.random.split(keys[3 + i], 3)
        params["layers"].append({
            "qkv": init_linear(k1, D_MODEL, 3 * D_MODEL),
            "mlp": {"0": init_linear(jax.random.fold_in(k2, 0),
                                     2 * D_MODEL, 2 * D_MODEL),
                    "2": init_linear(jax.random.fold_in(k2, 1),
                                     2 * D_MODEL, D_MODEL)},
            "line_mp": init_linear(k3, 2 * D_MODEL, D_MODEL),
        })
    return params


def _attn(p, x, source, mask_src):
    from ...ops.attention import mha
    from ..layers import linear, relu

    d = x.shape[-1]
    dh = d // NHEAD
    q = linear(p["qkv"], x)[:, :d].reshape(-1, NHEAD, dh).transpose(
        1, 0, 2)
    kv = linear(p["qkv"], source)
    k = kv[:, d:2 * d].reshape(-1, NHEAD, dh).transpose(1, 0, 2)
    v = kv[:, 2 * d:].reshape(-1, NHEAD, dh).transpose(1, 0, 2)
    msg = mha(q, k, v, mask_k=mask_src).transpose(1, 0, 2).reshape(-1, d)
    return x + linear(p["mlp"]["2"], relu(linear(
        p["mlp"]["0"], jnp.concatenate([x, msg], -1))))


def _line_message(p, x, n_kpts, n_lines, mask_ep):
    """Wireframe connectivity: endpoint 2i exchanges with 2i+1."""
    from ..layers import linear

    ep = x[n_kpts:]  # (2L, d)
    other = ep.reshape(n_lines, 2, -1)[:, ::-1].reshape(2 * n_lines, -1)
    upd = linear(p["line_mp"], jnp.concatenate([ep, other], -1))
    ep = jnp.where(mask_ep[:, None], ep + upd, ep)
    return jnp.concatenate([x[:n_kpts], ep], 0)


def gnn_forward(params, kpts0, desc0, lines0, mk0, ml0, kpts1, desc1,
                lines1, mk1, ml1, size0, size1, conf):
    """Joint point+line GNN. kpts*: (N, 2); desc*: (N, 256); lines*:
    (L, 2, 2) with validity ml*: (L,). Returns point matches (N,), point
    scores (N,), line similarity matrix (L, L)."""
    from ...ops.sinkhorn import (log_optimal_transport,
                                 matches_from_assignment)
    from ..layers import linear, relu

    n = kpts0.shape[0]
    ll = lines0.shape[0]

    def tokens(kpts, desc, lines, mask_l, size):
        pn = (kpts - size / 2) / size.max()
        ep = (lines.reshape(-1, 2) - size / 2) / size.max()  # (2L, 2)
        pos = jnp.concatenate([pn, ep], 0)
        prior = jnp.concatenate(
            [jnp.zeros((n, 1)), jnp.ones((2 * ll, 1))], 0)
        enc = linear(params["kenc"]["1"], relu(linear(
            params["kenc"]["0"], jnp.concatenate([pos, prior], -1))))
        flags = jnp.concatenate(
            [jnp.broadcast_to(params["line_flag"][0], (n, D_MODEL)),
             jnp.broadcast_to(params["line_flag"][1],
                              (2 * ll, D_MODEL))], 0)
        # endpoint appearance: reuse the nearest keypoint descriptor
        # space by zero-init appearance (positions + connectivity carry
        # the line signal; the checkpoint's endpoint encoder maps here)
        app = jnp.concatenate([desc, jnp.zeros((2 * ll, D_MODEL))], 0)
        return enc + flags + app

    x0 = tokens(kpts0, desc0, lines0, ml0, size0)
    x1 = tokens(kpts1, desc1, lines1, ml1, size1)
    ep_mask0 = jnp.repeat(ml0, 2)
    ep_mask1 = jnp.repeat(ml1, 2)
    tok_mask0 = jnp.concatenate([mk0, ep_mask0], 0)
    tok_mask1 = jnp.concatenate([mk1, ep_mask1], 0)

    for i, p in enumerate(params["layers"]):
        if i % 3 == 0:  # self
            x0 = _attn(p, x0, x0, tok_mask0)
            x1 = _attn(p, x1, x1, tok_mask1)
        elif i % 3 == 1:  # line message passing
            x0 = _line_message(p, x0, n, ll, ep_mask0)
            x1 = _line_message(p, x1, n, ll, ep_mask1)
        else:  # cross
            x0n = _attn(p, x0, x1, tok_mask1)
            x1 = _attn(p, x1, x0, tok_mask0)
            x0 = x0n

    # points: sinkhorn assignment over keypoint tokens
    f0 = x0[:n]
    f1 = x1[:n]
    sim = (f0 @ f1.T) / D_MODEL ** 0.25
    z = log_optimal_transport(sim, params["bin_score"],
                              conf.get("sinkhorn_iterations", 20),
                              mask0=mk0, mask1=mk1)
    matches0, mscores0 = matches_from_assignment(
        z, conf.get("match_threshold", 0.2), mask0=mk0, mask1=mk1)

    # lines: endpoint-pair similarity, orientation-invariant
    e0 = x0[n:].reshape(ll, 2, -1)
    e1 = x1[n:].reshape(ll, 2, -1)
    s = jnp.einsum("lad,mbd->lmab", e0, e1,
                   preferred_element_type=jnp.float32) / D_MODEL ** 0.5
    fwd = s[..., 0, 0] + s[..., 1, 1]
    rev = s[..., 0, 1] + s[..., 1, 0]
    line_sim = jnp.maximum(fwd, rev)
    line_sim = jnp.where(ml0[:, None] & ml1[None, :], line_sim, -1e9)
    return matches0, mscores0, line_sim


@functools.partial(jax.jit, static_argnames=("conf_key",))
def _gnn_apply(params, kpts0, desc0, lines0, mk0, ml0, kpts1, desc1,
               lines1, mk1, ml1, size0, size1, conf_key):
    return gnn_forward(params, kpts0, desc0, lines0, mk0, ml0, kpts1,
                       desc1, lines1, mk1, ml1, size0, size1,
                       dict(conf_key))


class GlueStick(BaseModel):
    """Reference contract: imcui/hloc/matchers/gluestick.py:16-99 —
    standalone dense matcher returning keypoint AND line matches."""

    default_conf = {
        "max_keypoints": 1024,
        "max_lines": 512,
        "min_line_length": 15.0,
        "min_line_votes": 3,
        "keypoint_threshold": 1e-4,
        "use_gnn": None,  # None = auto (on iff pretrained weights load)
        "match_threshold": 0.2,
        "sinkhorn_iterations": 20,
    }
    required_inputs = ["image0", "image1"]

    def _init(self, conf, rng):
        import jax

        from ...utils.weights import download_checkpoint
        from ..extractors.superpoint import SuperPoint

        self.sp = SuperPoint({
            "max_keypoints": conf["max_keypoints"],
            "keypoint_threshold": conf["keypoint_threshold"],
        })
        self.gnn_params = init_gnn_params(jax.random.PRNGKey(0))
        ckpt = download_checkpoint(
            "gluestick/checkpoint_GlueStick_MD.tar")
        gnn_pretrained = False  # conversion lands with the checkpoint
        self.meta = {"pretrained": self.sp.meta.get("pretrained", False),
                     "gnn_pretrained": gnn_pretrained}
        use = conf.get("use_gnn")
        self.use_gnn = gnn_pretrained if use is None else bool(use)
        self._gnn_conf_key = tuple(sorted({
            "match_threshold": float(conf.get("match_threshold", 0.2)),
            "sinkhorn_iterations": int(conf.get("sinkhorn_iterations",
                                                20)),
        }.items()))

    def _forward(self, data):
        import jax.numpy as jnp

        from ...models.extractors import superpoint as sp_mod
        from ...ops.matching import mutual_nn_match

        image0 = np.asarray(data["image0"])
        image1 = np.asarray(data["image1"])

        def gray(img):
            x = img[0]
            if x.shape[0] == 3:
                x = x.mean(0)
            else:
                x = x[0]
            return x

        g0, g1 = gray(image0), gray(image1)
        u0 = np.clip(g0 * 255, 0, 255).astype(np.uint8)
        u1 = np.clip(g1 * 255, 0, 255).astype(np.uint8)

        # keypoints + dense descriptor maps — one batched forward when the
        # pair shares a shape, per-image forwards otherwise (UI pairs are
        # generally different sizes)
        if g0.shape == g1.shape:
            feats = self.sp({"image": np.stack([g0, g1])[:, None]})
            x = jnp.asarray(np.stack([g0, g1])[:, :, :, None], jnp.float32)
            trunk = sp_mod.backbone(self.sp.params, x)
            dmaps = np.asarray(
                sp_mod.dense_descriptors(self.sp.params, trunk))
            f0 = {k: np.asarray(v[0]) for k, v in feats.items()}
            f1 = {k: np.asarray(v[1]) for k, v in feats.items()}
            dmap0, dmap1 = dmaps[0], dmaps[1]
        else:
            def run_sp(g):
                fe = self.sp({"image": g[None, None]})
                xg = jnp.asarray(g[None, :, :, None], jnp.float32)
                dm = np.asarray(sp_mod.dense_descriptors(
                    self.sp.params, sp_mod.backbone(self.sp.params, xg)))[0]
                return {k: np.asarray(v[0]) for k, v in fe.items()}, dm

            f0, dmap0 = run_sp(g0)
            f1, dmap1 = run_sp(g1)
        dmaps = [dmap0, dmap1]

        d0 = f0["descriptors"].T
        d1 = f1["descriptors"].T
        m0 = f0["mask"]
        m1 = f1["mask"]
        kpts0 = f0["keypoints"]
        kpts1 = f1["keypoints"]

        # line detection (shared by both matching paths)
        lines0 = detect_lines(u0, self.conf["max_lines"],
                              self.conf["min_line_length"])
        lines1 = detect_lines(u1, self.conf["max_lines"],
                              self.conf["min_line_length"])

        if self.use_gnn:
            # joint point+line GNN path (fixed-shape line padding)
            lmax = int(self.conf["max_lines"])

            def pad_lines(ln):
                out = np.zeros((lmax, 2, 2), np.float32)
                k = min(len(ln), lmax)
                out[:k] = ln[:k]
                valid_l = np.zeros((lmax,), bool)
                valid_l[:k] = True
                return out, valid_l

            pl0, vl0 = pad_lines(lines0)
            pl1, vl1 = pad_lines(lines1)
            h0, w0 = g0.shape
            h1, w1 = g1.shape
            matches0_j, mscores0_j, line_sim = _gnn_apply(
                self.gnn_params, jnp.asarray(kpts0), jnp.asarray(d0),
                jnp.asarray(pl0), jnp.asarray(m0), jnp.asarray(vl0),
                jnp.asarray(kpts1), jnp.asarray(d1), jnp.asarray(pl1),
                jnp.asarray(m1), jnp.asarray(vl1),
                jnp.asarray([w0, h0], jnp.float32),
                jnp.asarray([w1, h1], jnp.float32), self._gnn_conf_key)
            matches0 = np.asarray(matches0_j)
            mscores0 = np.asarray(mscores0_j)
            ls = np.asarray(line_sim)
            nn01 = ls.argmax(1)
            nn10 = ls.argmax(0)
            lmutual = np.arange(len(ls)) == nn10[nn01]
            lm_full = np.where(lmutual & vl0 & (ls.max(1) > 0), nn01, -1)
            lm = lm_full[: len(lines0)].astype(np.int32)
        else:
            res = mutual_nn_match(
                jnp.asarray(d0), jnp.asarray(d1), mask0=jnp.asarray(m0),
                mask1=jnp.asarray(m1))
            matches0 = np.asarray(res["matches0"])
            mscores0 = np.asarray(res["matching_scores0"])
            # line matching by descriptor voting along sampled points
            lp0 = sample_line_points(lines0)
            lp1 = sample_line_points(lines1)
            lm = np.full(len(lines0), -1, np.int32)
            if len(lines0) and len(lines1):
                ld0 = describe_points(dmaps[0].transpose(2, 0, 1), lp0)
                ld1 = describe_points(dmaps[1].transpose(2, 0, 1), lp1)
                lm = match_lines(ld0, ld1, self.conf["min_line_votes"])

        valid = matches0 > -1
        mk0 = kpts0[valid]
        mk1 = kpts1[np.clip(matches0[valid], 0, len(kpts1) - 1)]
        lvalid = lm > -1
        mlines0 = lines0[lvalid]
        mlines1 = lines1[np.clip(lm[lvalid], 0, max(len(lines1) - 1, 0))] \
            if lvalid.any() else np.zeros((0, 2, 2), np.float32)

        # line midpoints feed the RANSAC filter (reference line contract)
        line_kp0 = mlines0.mean(1) if len(mlines0) else \
            np.zeros((0, 2), np.float32)
        line_kp1 = mlines1.mean(1) if len(mlines1) else \
            np.zeros((0, 2), np.float32)

        return {
            "keypoints0": mk0[None],
            "keypoints1": mk1[None],
            "scores": mscores0[valid][None],
            "mask": np.ones((1, len(mk0)), bool),
            "lines0": mlines0[None],
            "lines1": mlines1[None],
            "raw_lines0": lines0[None],
            "raw_lines1": lines1[None],
            "line_keypoints0": line_kp0[None],
            "line_keypoints1": line_kp1[None],
        }
