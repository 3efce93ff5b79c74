"""Training-subsystem tests (imcui_tpu/train/): homography supervision
correctness, cv2 warp parity, an actual loss-decrease run, and dp×tp
sharded train-step consistency on the virtual mesh.

The reference is inference-only (imcui/hloc/utils/base_model.py downloads
checkpoints; no train loop exists in its tree) — this subsystem is a
beyond-reference capability, so the bar here is internal correctness:
labels must match a planted warp, the warp must match cv2, and the step
must actually optimise.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imcui_tpu.parallel import mesh as mesh_lib
from imcui_tpu.train import data, homography, losses, step


def test_sample_homographies_invertible_roundtrip():
    Hs = homography.sample_homographies(jax.random.PRNGKey(0), 16, 320, 240)
    Hs = np.asarray(Hs)
    assert Hs.shape == (16, 3, 3)
    dets = np.linalg.det(Hs)
    assert (np.abs(dets) > 1e-3).all()
    # warp ∘ inverse-warp is identity on points
    pts = np.random.default_rng(0).uniform(0, 200, (50, 2)).astype(np.float32)
    for H in Hs[:4]:
        fwd = np.asarray(homography.warp_points(jnp.asarray(H), jnp.asarray(pts)))
        back = np.asarray(homography.warp_points(
            jnp.asarray(np.linalg.inv(H).astype(np.float32)), jnp.asarray(fwd)))
        np.testing.assert_allclose(back, pts, atol=1e-2)


def test_warp_images_matches_cv2():
    cv2 = pytest.importorskip("cv2")
    rng = np.random.default_rng(1)
    h, w = 96, 128
    img = rng.uniform(0, 1, (h, w)).astype(np.float32)
    Hs = np.asarray(homography.sample_homographies(
        jax.random.PRNGKey(3), 3, w, h))
    got = np.asarray(homography.warp_images(
        jnp.asarray(img)[None, None].repeat(3, 0), jnp.asarray(Hs)))[:, 0]
    for i in range(3):
        ref = cv2.warpPerspective(img, Hs[i], (w, h), flags=cv2.INTER_LINEAR,
                                  borderValue=0.0)
        # compare away from the border-handling differences: cv2 treats
        # out-of-range source taps as the border value mid-pixel, we
        # zero whole out-of-range samples
        src = np.asarray(homography.warp_points(
            jnp.asarray(np.linalg.inv(Hs[i]).astype(np.float32)),
            jnp.asarray(np.stack(np.meshgrid(np.arange(w), np.arange(h)),
                                 -1).reshape(-1, 2).astype(np.float32))))
        interior = ((src[:, 0] >= 1) & (src[:, 0] <= w - 2)
                    & (src[:, 1] >= 1) & (src[:, 1] <= h - 2)).reshape(h, w)
        assert interior.sum() > 1000
        np.testing.assert_allclose(got[i][interior], ref[interior], atol=2e-3)


def test_gt_correspondences_planted():
    """Plant an exact warp correspondence set and check the labelling."""
    rng = np.random.default_rng(2)
    w, h = 320, 240
    H = np.asarray(homography.sample_homographies(
        jax.random.PRNGKey(5), 1, w, h))[0]
    n = 48
    kpts0 = rng.uniform(20, 200, (n, 2)).astype(np.float32)
    proj = np.asarray(homography.warp_points(jnp.asarray(H),
                                             jnp.asarray(kpts0)))
    inb = ((proj[:, 0] >= 0) & (proj[:, 0] <= w - 1)
           & (proj[:, 1] >= 0) & (proj[:, 1] <= h - 1))
    # image-1 keypoints: exact projections of the first 24, then far
    # distractors on a grid offset by >px_neg from every projection
    kpts1 = np.concatenate([
        proj[:24], rng.uniform(220, 300, (16, 2)).astype(np.float32)], 0)
    mask0 = np.ones(n, bool)
    mask1 = np.ones(40, bool)
    gt0, pos0, neg0, neg1 = losses.gt_correspondences(
        jnp.asarray(kpts0), jnp.asarray(kpts1), jnp.asarray(mask0),
        jnp.asarray(mask1), jnp.asarray(H), jnp.asarray([w, h], jnp.float32))
    gt0, pos0, neg0, neg1 = map(np.asarray, (gt0, pos0, neg0, neg1))
    for i in range(24):
        if inb[i]:
            assert pos0[i] and gt0[i] == i, i
    # unprojected points whose reprojection is far from every kpt1 are
    # negatives (as long as they are in bounds of the labelling rule)
    far = np.sqrt(((proj[:, None] - kpts1[None]) ** 2).sum(-1)).min(1) > 5.0
    for i in range(24, n):
        if far[i]:
            assert not pos0[i]
            assert neg0[i], i
    # distractor kpts1 that are >px_neg from every projection are neg1
    d1 = np.sqrt(((proj[:, None] - kpts1[None]) ** 2).sum(-1)).min(0)
    for j in range(24, 40):
        if d1[j] > 5.0:
            assert neg1[j], j


def test_synthetic_images_shapes_and_range():
    imgs = np.asarray(data.synthetic_images(jax.random.PRNGKey(7), 2, 64, 96))
    assert imgs.shape == (2, 1, 64, 96)
    assert imgs.min() >= 0.0 and imgs.max() <= 1.0
    # must have real structure, not a constant field
    assert imgs.std() > 0.03


def test_train_step_decreases_loss():
    """Eight AdamW steps on a FIXED batch + fixed warps must reduce the
    deep-supervised NLL (the optimisation sanity bar)."""
    lg_params, opt_state, sp_params, optimizer = step.init_train_state(
        rng=jax.random.PRNGKey(0), n_layers=2, max_keypoints=64, lr=2e-4)
    tstep = step.make_train_step(optimizer, max_keypoints=64, num_heads=4,
                                 keypoint_threshold=0.0, remat=True)
    imgs = data.synthetic_images(jax.random.PRNGKey(1), 2, 96, 96)
    key = jax.random.PRNGKey(2)  # same key every step → fixed batch
    hist = []
    for _ in range(8):
        lg_params, opt_state, m = tstep(lg_params, opt_state, sp_params,
                                        imgs, key)
        hist.append(float(m["loss"]))
        assert np.isfinite(hist[-1])
        assert float(m["n_pos"]) > 0  # supervision actually fires
    assert hist[-1] < hist[0] * 0.9, hist


def test_corner_cell_labels_planted():
    from imcui_tpu.train import superpoint as spt

    corners = jnp.asarray([[3.0, 2.0],      # cell (0,0), inpos 2*8+3=19
                           [12.0, 9.0],     # cell (1,1), inpos 1*8+4=12
                           [100.0, 100.0]], jnp.float32)
    mask = jnp.asarray([True, True, False])
    labels = np.asarray(spt.corner_cell_labels(corners, mask, 32, 32))
    assert labels.shape == (4, 4)
    assert labels[0, 0] == 19
    assert labels[1, 1] == 12
    # masked corner's cell stays dustbin; all other cells dustbin
    assert (labels.flatten() == 64).sum() == 14


def test_synthetic_corners_are_real_image_corners():
    """GT corner labels must coincide with actual intensity structure:
    local variance at labelled corners far exceeds the image median."""
    from imcui_tpu.train import data as tdata

    imgs, corners, mask = tdata.synthetic_images_with_corners(
        jax.random.PRNGKey(3), 2, 128, 128)
    imgs, corners, mask = map(np.asarray, (imgs, corners, mask))
    assert mask.sum() > 10
    var_corner, var_rand = [], []
    rng = np.random.default_rng(0)
    for b in range(2):
        im = imgs[b, 0]
        for x, y in corners[b][mask[b]][:20]:
            xi, yi = int(round(x)), int(round(y))
            patch = im[max(yi - 2, 0):yi + 3, max(xi - 2, 0):xi + 3]
            var_corner.append(patch.std())
        for _ in range(40):
            xi, yi = rng.integers(3, 125, 2)
            var_rand.append(im[yi - 2:yi + 3, xi - 2:xi + 3].std())
    assert np.mean(var_corner) > 2.0 * np.median(var_rand)


def test_descriptor_hinge_identity_warp():
    """Under the identity homography the positive set is each cell plus
    its 4-neighbours (centers exactly 8 px apart — the published ≤8 px
    rule), and the loss restates as the explicit hinge."""
    from imcui_tpu.train import superpoint as spt

    rng = np.random.default_rng(4)
    d = rng.normal(size=(6, 6, 32)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    loss, n_pos = spt.descriptor_hinge_loss(
        jnp.asarray(d), jnp.asarray(d), jnp.eye(3))
    # 36 self pairs + 2*(6*5) horizontal + 2*(5*6) vertical adjacents
    assert int(n_pos) == 156
    ys, xs = np.mgrid[0:6, 0:6].astype(np.float64)
    c = np.stack([xs * 8 + 4, ys * 8 + 4], -1).reshape(-1, 2)
    s = (((c[:, None] - c[None]) ** 2).sum(-1) <= 64.0)
    dot = d.reshape(-1, 32) @ d.reshape(-1, 32).T
    expect = (250.0 * s * np.maximum(0.0, 1.0 - dot)
              + (~s) * np.maximum(0.0, dot - 0.2)).mean()
    np.testing.assert_allclose(float(loss), expect, rtol=1e-5)


def test_superpoint_train_step_decreases_loss():
    from imcui_tpu.train import superpoint as spt

    params, opt_state, optimizer = spt.init_sp_train_state(
        jax.random.PRNGKey(0), lr=3e-4)
    tstep = spt.make_sp_train_step(optimizer, batch=2, h=96, w=96)
    key = jax.random.PRNGKey(1)  # fixed batch → deterministic descent
    hist = []
    for _ in range(6):
        params, opt_state, m = tstep(params, opt_state, key)
        hist.append(float(m["loss"]))
        assert np.isfinite(hist[-1])
        assert float(m["n_desc_pos"]) > 0
    assert hist[-1] < hist[0] * 0.9, hist


def test_trained_tree_roundtrips_into_serving(tmp_path):
    """train → save_tree_npz → load_params(checkpoint_npz=...) → the
    SERVING forward reproduces the trained model exactly (closes the
    train→serve loop; no conversion layer in between)."""
    from imcui_tpu.models.extractors import superpoint as sp
    from imcui_tpu.train import superpoint as spt
    from imcui_tpu.utils import weights as wutils

    params, opt_state, optimizer = spt.init_sp_train_state(
        jax.random.PRNGKey(7), lr=1e-3)
    tstep = spt.make_sp_train_step(optimizer, batch=1, h=96, w=96)
    params, _, _ = tstep(params, opt_state, jax.random.PRNGKey(8))

    path = tmp_path / "sp.npz"
    wutils.save_tree_npz(path, params)
    loaded, meta = sp.load_params({"checkpoint_npz": str(path)})
    assert meta["pretrained"]

    img = data.synthetic_images(jax.random.PRNGKey(9), 1, 96, 96)
    wh = jnp.asarray([[96, 96]], jnp.int32)
    a = sp.apply(params, img, wh, max_keypoints=32,
                 keypoint_threshold=0.0, precision="fp32")
    b = sp.apply(loaded, img, wh, max_keypoints=32,
                 keypoint_threshold=0.0, precision="fp32")
    for k in ("keypoints", "scores", "descriptors"):
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))

    # corrupted tree (missing leaf) must raise loudly, not mis-load
    flat = dict(np.load(path))
    flat.pop("conv1a.w")
    np.savez(tmp_path / "bad.npz", **flat)
    with pytest.raises(ValueError):
        sp.load_params({"checkpoint_npz": str(tmp_path / "bad.npz")})


def test_lightglue_teacher_loads_local_npz(tmp_path):
    """init_train_state(sp_checkpoint_npz=...) must use the locally
    trained SuperPoint as the frozen teacher — the pipeline that chains
    'train superpoint-adapted' into 'train lightglue' offline."""
    from imcui_tpu.models.extractors import superpoint as sp
    from imcui_tpu.utils import weights as wutils

    trained = sp.init_params(jax.random.PRNGKey(11))
    path = tmp_path / "sp_adapted.npz"
    wutils.save_tree_npz(path, trained)

    _, _, sp_params, _ = step.init_train_state(
        rng=jax.random.PRNGKey(0), n_layers=2, max_keypoints=32,
        sp_checkpoint_npz=path)
    np.testing.assert_array_equal(
        np.asarray(sp_params["conv1a"]["w"]),
        np.asarray(trained["conv1a"]["w"]))


def test_pose_homography_matches_projective_chain():
    """H = K(R − t·nᵀ/d)K⁻¹ must agree EXACTLY with the geometric
    chain: backproject a pixel to the plane n·X = d, move it by the
    rigid (R, t), reproject. Validates the wide-baseline warp family
    against first principles (the same construction eval/synthpose
    renders with)."""
    Hs, comp = homography.sample_pose_homographies(
        jax.random.PRNGKey(3), 6, 320, 240, return_components=True)
    Hs = np.asarray(Hs)
    K = np.asarray(comp["K"])
    Kinv = np.linalg.inv(K)
    pts = np.random.default_rng(4).uniform(
        [40, 30], [280, 210], (20, 2))
    for b in range(6):
        R, t = np.asarray(comp["R"][b]), np.asarray(comp["t"][b])
        n, d = np.asarray(comp["n"][b]), float(comp["d"][b])
        ray = np.concatenate([pts, np.ones((20, 1))], 1) @ Kinv.T
        depth = d / (ray @ n)
        X1 = (ray * depth[:, None]) @ R.T + t
        u1 = X1 @ K.T
        u1 = u1[:, :2] / u1[:, 2:]
        via_h = np.asarray(homography.warp_points(
            jnp.asarray(Hs[b]), jnp.asarray(pts, jnp.float32)))
        np.testing.assert_allclose(via_h, u1, atol=1e-2)


def test_sample_warps_mixed_dispatch():
    """'mixed' must draw from both families; 'similarity' must equal
    the published sampler under the same key."""
    k = jax.random.PRNGKey(5)
    a = np.asarray(homography.sample_warps(k, 4, 320, 240,
                                           family="similarity"))
    b = np.asarray(homography.sample_homographies(k, 4, 320, 240))
    np.testing.assert_array_equal(a, b)
    m = np.asarray(homography.sample_warps(k, 64, 320, 240,
                                           family="mixed"))
    assert m.shape == (64, 3, 3)
    assert np.isfinite(m).all()
    with pytest.raises(ValueError):
        homography.sample_warps(k, 2, 64, 64, family="nope")


def test_loftr_coarse_gt_planted():
    """Dense coarse labels under planted warps: identity maps every cell
    to itself; an exact one-cell translation shifts the label grid."""
    from imcui_tpu.train import loftr as lft

    hc, wc = 6, 8
    eye = jnp.eye(3)
    j_gt, pos, proj = lft.coarse_gt(eye, hc, wc)
    np.testing.assert_array_equal(np.asarray(j_gt), np.arange(hc * wc))
    assert bool(np.asarray(pos).all())
    # +8 px in x → partner is the next cell over; the last column's
    # warped center leaves the margin and must be negative
    T = jnp.asarray([[1.0, 0, 8.0], [0, 1, 0], [0, 0, 1]])
    j_gt, pos, proj = lft.coarse_gt(T, hc, wc)
    j = np.arange(hc * wc)
    inner = (j % wc) < wc - 1
    np.testing.assert_array_equal(np.asarray(j_gt)[inner], j[inner] + 1)
    assert not np.asarray(pos)[~inner].any()
    np.testing.assert_allclose(np.asarray(proj)[0], [12.0, 4.0])


def test_loftr_train_step_decreases_loss():
    """Eight AdamW steps on a fixed batch + fixed warps must reduce the
    dense coarse NLL (dense-tier optimisation sanity bar)."""
    import optax

    from imcui_tpu.models.matchers import loftr as lf
    from imcui_tpu.train import loftr as lft

    opt = optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(1e-3))
    params = lf.init_params(jax.random.PRNGKey(0))
    opt_state = opt.init(params)
    tstep = lft.make_train_step(opt, h=64, w=64, batch=2, n_fine=16)
    imgs = data.synthetic_images(jax.random.PRNGKey(1), 2, 64, 64)
    key = jax.random.PRNGKey(2)  # fixed key → fixed warps each step
    hist = []
    for _ in range(8):
        params, opt_state, m = tstep(params, opt_state, imgs, key)
        hist.append(float(m["loss"]))
        assert np.isfinite(hist[-1])
        assert float(m["n_pos"]) > 0
    assert hist[-1] < hist[0] * 0.9, hist


def test_loftr_trained_tree_roundtrips_into_serving(tmp_path):
    """train loftr → save_tree_npz → load_params(checkpoint_npz=...) →
    the serving forward reproduces the trained model exactly."""
    import optax

    from imcui_tpu.models.matchers import loftr as lf
    from imcui_tpu.train import loftr as lft
    from imcui_tpu.utils import weights as wutils

    opt = optax.adamw(1e-3)
    params = lf.init_params(jax.random.PRNGKey(3))
    tstep = lft.make_train_step(opt, h=64, w=64, batch=1, n_fine=8)
    params, _, _ = tstep(params, opt.init(params),
                         data.synthetic_images(jax.random.PRNGKey(4),
                                               1, 64, 64),
                         jax.random.PRNGKey(5))

    path = tmp_path / "loftr.npz"
    wutils.save_tree_npz(path, params)
    loaded, meta = lf.load_params({"checkpoint_npz": str(path)})
    assert meta["pretrained"]

    img = data.synthetic_images(jax.random.PRNGKey(6), 2, 64, 64)
    img0, img1 = img[0].transpose(1, 2, 0), img[1].transpose(1, 2, 0)
    wh = jnp.asarray([64, 64], jnp.int32)
    conf = {"match_threshold": 0.0, "temperature": 0.1,
            "max_matches": 32}
    a = lf.forward_pair(params, img0, img1, wh, wh, conf)
    b = lf.forward_pair(loaded, img0, img1, wh, wh, conf)
    for k in ("keypoints0", "keypoints1", "scores"):
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))


def test_train_step_sharded_matches_single_device():
    """dp=2 × tp=2 on the virtual mesh reproduces the single-device
    update (same program, shardings only change placement)."""
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    lg_params, opt_state, sp_params, optimizer = step.init_train_state(
        rng=jax.random.PRNGKey(0), n_layers=2, max_keypoints=48, lr=1e-4)
    tstep = step.make_train_step(optimizer, max_keypoints=48, num_heads=4,
                                 keypoint_threshold=0.0, remat=True)
    imgs = data.synthetic_images(jax.random.PRNGKey(1), 4, 64, 64)
    key = jax.random.PRNGKey(2)

    ref_p, _, ref_m = tstep(lg_params, opt_state, sp_params, imgs, key)

    mesh = mesh_lib.make_mesh(4, model_parallel=2)
    lg_sh = mesh_lib.shard_lightglue_params(lg_params, mesh)
    opt_sh = optimizer.init(lg_sh)
    sp_sh = mesh_lib.replicate(sp_params, mesh)
    imgs_sh = mesh_lib.shard_batch([imgs], mesh)[0]
    with mesh:
        got_p, _, got_m = tstep(lg_sh, opt_sh, sp_sh, imgs_sh, key)

    np.testing.assert_allclose(float(got_m["loss"]), float(ref_m["loss"]),
                               rtol=2e-5)
    flat_ref = jax.tree_util.tree_leaves(ref_p)
    flat_got = jax.tree_util.tree_leaves(got_p)
    for a, b in zip(flat_ref, flat_got):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=5e-5, rtol=1e-4)
