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
2. the GlueStick GNN (``gnn_forward`` below): the PUBLISHED layer stack
   (cvg/GlueStick models/gluestick.py) with upstream parameter naming —
   junction tokens (keypoints ∪ line endpoints, SuperPoint-described),
   SuperGlue-style kenc + the endpoint encoder lenc, 18 alternating
   self/cross AttentionalPropagation layers with line message passing
   after every self layer, Sinkhorn point head (bin_score) and
   orientation-max double-softmax line head (line_bin_score). The real
   ``checkpoint_GlueStick_MD.tar`` converts in ``_init`` through the
   shared rank-based engine (loud on mismatch), flipping ``use_gnn`` on
   automatically; an untrained GNN scrambles descriptors, so the voting
   path is the honest offline default.

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
# GlueStick GNN — upstream-congruent (cvg/GlueStick models/gluestick.py):
# tokens are the wireframe JUNCTIONS (keypoints ∪ line endpoints, each
# with a SuperPoint descriptor); kenc/lenc are SuperGlue-style Conv1d
# MLPs; 18 alternating self/cross AttentionalPropagation layers, each
# self layer followed by LINE MESSAGE PASSING over the wireframe
# connectivity (endpoint message = MLP(cat[self, partner, line_enc]),
# scatter-mean into junctions); point head = final_proj + Sinkhorn with
# bin_score; line head = final_line_proj endpoint-pair scores,
# orientation max, double-softmax with line_bin_score. Parameter naming
# mirrors the upstream state_dict (kenc.encoder.{i}, lenc.encoder.{i},
# gnn.layers.{i}.attn.proj.{0,1,2}/attn.merge/mlp.{0,1,3},
# gnn.line_layers.{j}.mlp.{0,1,3}, final_proj, final_line_proj,
# bin_score, line_bin_score) so checkpoint_GlueStick_MD.tar converts
# through the shared rank-based engine.
# ---------------------------------------------------------------------------

N_GNN_LAYERS = 18  # ["self", "cross"] * 9 (upstream GNN_layers)
KENC_LAYERS = [32, 64, 128, 256]


def init_gnn_params(rng):
    from ..layers import init_linear
    from .superglue import init_mlp

    keys = jax.random.split(rng, 5 + N_GNN_LAYERS + N_GNN_LAYERS // 2)
    params = {
        "kenc": {"encoder": init_mlp(keys[0],
                                     [3] + KENC_LAYERS + [D_MODEL])},
        "lenc": {"encoder": init_mlp(keys[1],
                                     [5] + KENC_LAYERS + [D_MODEL])},
        "gnn": {"layers": [], "line_layers": []},
        "final_proj": init_linear(keys[2], D_MODEL, D_MODEL),
        "final_line_proj": init_linear(keys[3], D_MODEL, D_MODEL),
        "bin_score": jnp.asarray(1.0),
        "line_bin_score": jnp.asarray(1.0),
    }
    for i in range(N_GNN_LAYERS):
        k = jax.random.split(keys[4 + i], 5)
        params["gnn"]["layers"].append({
            "attn": {
                "merge": init_linear(k[0], D_MODEL, D_MODEL),
                "proj": {"0": init_linear(k[1], D_MODEL, D_MODEL),
                         "1": init_linear(k[2], D_MODEL, D_MODEL),
                         "2": init_linear(k[3], D_MODEL, D_MODEL)},
            },
            "mlp": init_mlp(k[4], [2 * D_MODEL, 2 * D_MODEL, D_MODEL]),
        })
    for j in range(N_GNN_LAYERS // 2):
        params["gnn"]["line_layers"].append({
            "mlp": init_mlp(keys[5 + N_GNN_LAYERS + j],
                            [3 * D_MODEL, 2 * D_MODEL, D_MODEL])})
    return params


def _line_message(p, x, line_enc, junc_idx, mask_line):
    """Upstream LineLayer: each endpoint token receives
    MLP(cat[own desc, partner-endpoint desc, line encoding]), aggregated
    into its junction by scatter-MEAN (junctions may anchor several
    lines). x: (T, D) junction tokens; junc_idx: (2L,) endpoint→junction
    indices (consecutive pairs are one line)."""
    from .superglue import mlp_apply

    t, d = x.shape
    two_l = junc_idx.shape[0]
    ep = x[junc_idx]                                       # (2L, D)
    other = ep.reshape(-1, 2, d)[:, ::-1].reshape(two_l, d)
    msg = mlp_apply(p["mlp"],
                    jnp.concatenate([ep, other, line_enc], -1),
                    [3 * d, 2 * d, d])
    w = jnp.repeat(mask_line, 2).astype(x.dtype)
    upd = jax.ops.segment_sum(msg * w[:, None], junc_idx, num_segments=t)
    cnt = jax.ops.segment_sum(w, junc_idx, num_segments=t)
    return x + upd / jnp.maximum(cnt, 1.0)[:, None]


def log_double_softmax(scores, bin_score):
    """Upstream gluestick line assignment: averaged row/column
    log-softmax with a learned bin. scores: (M, N) → (M+1, N+1)."""
    m, n = scores.shape
    s0 = jnp.concatenate([scores, jnp.full((m, 1), bin_score)], 1)
    s1 = jnp.concatenate([scores, jnp.full((1, n), bin_score)], 0)
    s0 = jax.nn.log_softmax(s0, axis=1)
    s1 = jax.nn.log_softmax(s1, axis=0)
    out = jnp.zeros((m + 1, n + 1), scores.dtype)
    out = out.at[:m, :n].set((s0[:, :n] + s1[:m, :]) / 2)
    out = out.at[:m, n].set(s0[:, n])
    out = out.at[m, :n].set(s1[m, :])
    return out


def gnn_forward(params, junc0, jdesc0, jscore0, lines0, lscore0, jidx0,
                mk0, ml0, junc1, jdesc1, jscore1, lines1, lscore1, jidx1,
                mk1, ml1, size0, size1, conf):
    """Joint point+line GNN over junction tokens.

    junc*: (T, 2) junction positions; jdesc*: (T, 256) SuperPoint
    descriptors; jscore*: (T,); lines*: (L, 2, 2); lscore*: (L,);
    jidx*: (2L,) endpoint→junction token indices; mk*: (T,) token
    validity; ml*: (L,) line validity. Returns point matches (T,) +
    scores, line matches (L,) + scores."""
    from ...ops.sinkhorn import (log_optimal_transport,
                                 matches_from_assignment)
    from ..layers import linear
    from .superglue import (attn_propagation, mlp_apply,
                            normalize_keypoints)

    t = junc0.shape[0]
    ll = lines0.shape[0]

    def encode(junc, jdesc, jscore, lines, lscore, size):
        pn = normalize_keypoints(junc, size)
        x = jdesc + mlp_apply(
            params["kenc"]["encoder"],
            jnp.concatenate([pn, jscore[:, None]], -1),
            [3] + KENC_LAYERS + [D_MODEL])
        ep = normalize_keypoints(lines.reshape(-1, 2), size)  # (2L, 2)
        e2 = ep.reshape(-1, 2, 2)
        off = (e2[:, ::-1] - e2).reshape(-1, 2)   # vector to the partner
        lenc_in = jnp.concatenate(
            [ep, off, jnp.repeat(lscore, 2)[:, None]], -1)
        line_enc = mlp_apply(params["lenc"]["encoder"], lenc_in,
                             [5] + KENC_LAYERS + [D_MODEL])
        return x, line_enc

    x0, line_enc0 = encode(junc0, jdesc0, jscore0, lines0, lscore0, size0)
    x1, line_enc1 = encode(junc1, jdesc1, jscore1, lines1, lscore1, size1)

    for i, p in enumerate(params["gnn"]["layers"]):
        if i % 2 == 0:  # self + line message passing
            x0 = x0 + attn_propagation(p, x0, x0, mk0, NHEAD)
            x1 = x1 + attn_propagation(p, x1, x1, mk1, NHEAD)
            lp = params["gnn"]["line_layers"][i // 2]
            x0 = _line_message(lp, x0, line_enc0, jidx0, ml0)
            x1 = _line_message(lp, x1, line_enc1, jidx1, ml1)
        else:  # cross
            x0n = x0 + attn_propagation(p, x0, x1, mk1, NHEAD)
            x1 = x1 + attn_propagation(p, x1, x0, mk0, NHEAD)
            x0 = x0n

    # points: sinkhorn assignment over junction tokens
    f0 = linear(params["final_proj"], x0)
    f1 = linear(params["final_proj"], x1)
    sim = (f0 @ f1.T) / D_MODEL ** 0.5
    z = log_optimal_transport(sim, params["bin_score"],
                              conf.get("sinkhorn_iterations", 20),
                              mask0=mk0, mask1=mk1)
    matches0, mscores0 = matches_from_assignment(
        z, conf.get("match_threshold", 0.2), mask0=mk0, mask1=mk1)

    # lines: endpoint-pair similarity through final_line_proj,
    # orientation max, double softmax
    le0 = linear(params["final_line_proj"], x0)[jidx0]      # (2L, D)
    le1 = linear(params["final_line_proj"], x1)[jidx1]
    s = (le0 @ le1.T / D_MODEL ** 0.5).reshape(ll, 2, ll, 2)
    raw = 0.5 * jnp.maximum(s[:, 0, :, 0] + s[:, 1, :, 1],
                            s[:, 0, :, 1] + s[:, 1, :, 0])
    raw = jnp.where(ml0[:, None] & ml1[None, :], raw, -1e9)
    zl = log_double_softmax(raw, params["line_bin_score"])
    lmatches0, lscores0 = matches_from_assignment(
        zl, conf.get("match_threshold", 0.2), mask0=ml0, mask1=ml1)
    return matches0, mscores0, lmatches0, lscores0


@functools.partial(jax.jit, static_argnames=("conf_key",))
def _gnn_apply(params, junc0, jdesc0, jscore0, lines0, lscore0, jidx0,
               mk0, ml0, junc1, jdesc1, jscore1, lines1, lscore1, jidx1,
               mk1, ml1, size0, size1, conf_key):
    return gnn_forward(params, junc0, jdesc0, jscore0, lines0, lscore0,
                       jidx0, mk0, ml0, junc1, jdesc1, jscore1, lines1,
                       lscore1, jidx1, mk1, ml1, size0, size1,
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
        gnn_pretrained = False
        if ckpt is not None:
            # TwoViewPipeline checkpoint: matcher.* holds the GNN (the
            # extractor side is SuperPoint + pytlsd, loaded separately);
            # loud on mismatch like every .pth path.
            from ...utils.weights import (assert_tree_matches,
                                          convert_state_dict_auto,
                                          load_state_dict,
                                          normalize_state_dict,
                                          prune_to_tree)

            sd = load_state_dict(ckpt)
            sd = normalize_state_dict(
                sd, rename=((r"^matcher\.", ""),),
                drop=(r"^extractor\.", r"^ground_truth"))
            tree = prune_to_tree(convert_state_dict_auto(sd),
                                 self.gnn_params)
            assert_tree_matches(tree, self.gnn_params, "gluestick")
            self.gnn_params = tree
            gnn_pretrained = True
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
            # joint point+line GNN path over the junction token set:
            # [N keypoints ‖ 2L line endpoints], fixed-shape padding.
            # Endpoint appearance = SuperPoint descriptors sampled at the
            # endpoints (the wireframe extractor's junction descriptors);
            # line scores = normalised lengths (the pytlsd saliency
            # analog).
            lmax = int(self.conf["max_lines"])
            n_kpts = len(kpts0)

            def pad_lines(ln):
                out = np.zeros((lmax, 2, 2), np.float32)
                k = min(len(ln), lmax)
                out[:k] = ln[:k]
                valid_l = np.zeros((lmax,), bool)
                valid_l[:k] = True
                lengths = np.linalg.norm(out[:, 1] - out[:, 0], axis=-1)
                lsc = lengths / max(lengths.max(), 1e-6)
                return out, valid_l, lsc.astype(np.float32)

            pl0, vl0, ls0 = pad_lines(lines0)
            pl1, vl1, ls1 = pad_lines(lines1)

            def junctions(kp, desc, ksc, mk, pl, vl, dmap):
                ep = pl.reshape(-1, 2)
                epd = describe_points(dmap.transpose(2, 0, 1), ep)
                junc = np.concatenate([kp, ep], 0).astype(np.float32)
                jdesc = np.concatenate([desc, epd], 0).astype(np.float32)
                jscore = np.concatenate(
                    [ksc, np.repeat(vl.astype(np.float32), 2)], 0)
                jmask = np.concatenate([mk, np.repeat(vl, 2)], 0)
                jidx = n_kpts + np.arange(2 * lmax, dtype=np.int32)
                return junc, jdesc, jscore, jmask, jidx

            j0 = junctions(kpts0, d0, f0["scores"], m0, pl0, vl0, dmap0)
            j1 = junctions(kpts1, d1, f1["scores"], m1, pl1, vl1, dmap1)
            h0, w0 = g0.shape
            h1, w1 = g1.shape
            matches0_j, mscores0_j, lm_j, _lsc_j = _gnn_apply(
                self.gnn_params,
                jnp.asarray(j0[0]), jnp.asarray(j0[1]), jnp.asarray(j0[2]),
                jnp.asarray(pl0), jnp.asarray(ls0), jnp.asarray(j0[4]),
                jnp.asarray(j0[3]), jnp.asarray(vl0),
                jnp.asarray(j1[0]), jnp.asarray(j1[1]), jnp.asarray(j1[2]),
                jnp.asarray(pl1), jnp.asarray(ls1), jnp.asarray(j1[4]),
                jnp.asarray(j1[3]), jnp.asarray(vl1),
                jnp.asarray([w0, h0], jnp.float32),
                jnp.asarray([w1, h1], jnp.float32), self._gnn_conf_key)
            # point outputs over the full junction set (upstream contract:
            # the wireframe's junctions ARE the keypoints)
            matches0 = np.asarray(matches0_j)
            mscores0 = np.asarray(mscores0_j)
            kpts0 = j0[0]
            kpts1 = j1[0]
            lm = np.asarray(lm_j)[: len(lines0)].astype(np.int32)
            lm = np.where(lm < len(lines1), lm, -1)
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
