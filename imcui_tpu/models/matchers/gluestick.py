"""Point + line matching (GlueStick-family contract).

Reference contract: imcui/hloc/matchers/gluestick.py:16-99 — a wireframe
extractor (SuperPoint keypoints + pytlsd line segments) feeding a GNN that
returns BOTH keypoint matches and line matches; the dense UI path consumes
{lines0, lines1, raw_lines0/1, line_keypoints0/1}
(imcui/hloc/match_dense.py:687-721).

Implementation scope (honest): the upstream GlueStick GNN's checkpoint is
unavailable offline and pytlsd is not installed. This module implements the
same pipeline with in-framework components: OpenCV LSD line segments
(pytlsd's role), SuperPoint keypoints + descriptors, on-device mutual-NN
keypoint matching, and line matching by descriptor voting along sampled
line points (each line is described by descriptors sampled at S points;
two lines match when their sampled descriptors mutually agree). The
GlueStick GNN attention refinement is future work; the I/O contract and
line handling are complete.
"""

import cv2
import numpy as np

from ...utils.base_model import BaseModel

N_LINE_SAMPLES = 5


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


class GlueStick(BaseModel):
    """Reference contract: imcui/hloc/matchers/gluestick.py:16-99 —
    standalone dense matcher returning keypoint AND line matches."""

    default_conf = {
        "max_keypoints": 1024,
        "max_lines": 512,
        "min_line_length": 15.0,
        "min_line_votes": 3,
        "keypoint_threshold": 1e-4,
    }
    required_inputs = ["image0", "image1"]

    def _init(self, conf, rng):
        from ..extractors.superpoint import SuperPoint

        self.sp = SuperPoint({
            "max_keypoints": conf["max_keypoints"],
            "keypoint_threshold": conf["keypoint_threshold"],
        })
        self.meta = {"pretrained": self.sp.meta.get("pretrained", False)}

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

        # keypoints + dense descriptor maps (one batched forward)
        feats = self.sp({"image": np.stack([g0, g1])[:, None]})
        x = jnp.asarray(np.stack([g0, g1])[:, :, :, None], jnp.float32)
        trunk = sp_mod.backbone(self.sp.params, x)
        dmaps = np.asarray(sp_mod.dense_descriptors(self.sp.params, trunk))

        # point matching
        d0 = np.asarray(feats["descriptors"][0]).T
        d1 = np.asarray(feats["descriptors"][1]).T
        m0 = np.asarray(feats["mask"][0])
        m1 = np.asarray(feats["mask"][1])
        res = mutual_nn_match(jnp.asarray(d0), jnp.asarray(d1),
                              mask0=jnp.asarray(m0), mask1=jnp.asarray(m1))
        matches0 = np.asarray(res["matches0"])
        kpts0 = np.asarray(feats["keypoints"][0])
        kpts1 = np.asarray(feats["keypoints"][1])
        valid = matches0 > -1
        mk0 = kpts0[valid]
        mk1 = kpts1[np.clip(matches0[valid], 0, len(kpts1) - 1)]

        # line detection + matching
        lines0 = detect_lines(u0, self.conf["max_lines"],
                              self.conf["min_line_length"])
        lines1 = detect_lines(u1, self.conf["max_lines"],
                              self.conf["min_line_length"])
        lp0 = sample_line_points(lines0)
        lp1 = sample_line_points(lines1)
        lm = np.full(len(lines0), -1, np.int32)
        if len(lines0) and len(lines1):
            ld0 = describe_points(dmaps[0].transpose(2, 0, 1), lp0)
            ld1 = describe_points(dmaps[1].transpose(2, 0, 1), lp1)
            lm = match_lines(ld0, ld1, self.conf["min_line_votes"])
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
            "scores": np.asarray(res["matching_scores0"])[valid][None],
            "mask": np.ones((1, len(mk0)), bool),
            "lines0": mlines0[None],
            "lines1": mlines1[None],
            "raw_lines0": lines0[None],
            "raw_lines1": lines1[None],
            "line_keypoints0": line_kp0[None],
            "line_keypoints1": line_kp1[None],
        }
