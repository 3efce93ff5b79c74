"""SfM utility tests: COLMAP db/model round trips, on-device geometric
verification into the db, and end-to-end localization with the JAX PnP."""

import numpy as np
import pytest

from imcui_tpu.utils import read_write_model as rwm
from imcui_tpu.utils.database import (COLMAPDatabase, blob_to_array,
                                      image_ids_to_pair_id)
from imcui_tpu.utils.geometry import qvec2rotmat, rotmat2qvec


def test_qvec_roundtrip(rng):
    for _ in range(5):
        q = rng.randn(4)
        q /= np.linalg.norm(q)
        if q[0] < 0:
            q = -q
        R = qvec2rotmat(q)
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-10)
        np.testing.assert_allclose(rotmat2qvec(R), q, atol=1e-8)


def test_database_roundtrip(tmp_path):
    db_path = tmp_path / "test.db"
    db = COLMAPDatabase.connect(db_path)
    db.create_tables()
    cam = db.add_camera(2, 640, 480, np.array([700.0, 320, 240, 0.0]))
    i0 = db.add_image("a.jpg", cam)
    i1 = db.add_image("b.jpg", cam)
    kp = np.random.RandomState(0).rand(100, 2).astype(np.float32) * 640
    db.add_keypoints(i0, kp)
    db.add_keypoints(i1, kp)
    matches = np.stack([np.arange(50), np.arange(50)], 1)
    db.add_matches(i0, i1, matches)
    db.add_two_view_geometry(i0, i1, matches[:30], F=np.eye(3))
    db.commit()

    rows = db.execute("SELECT data, rows FROM keypoints WHERE image_id=?;",
                      (i0,)).fetchone()
    out = blob_to_array(rows[0], np.float32, (-1, 2))
    np.testing.assert_allclose(out, kp)
    pid = image_ids_to_pair_id(i0, i1)
    r = db.execute("SELECT rows FROM two_view_geometries WHERE pair_id=?;",
                   (pid,)).fetchone()
    assert r[0] == 30
    db.close()


def make_synthetic_model(n_points=200, n_images=4, seed=0):
    rng = np.random.RandomState(seed)
    K = np.array([[800.0, 0, 320], [0, 800.0, 240], [0, 0, 1]])
    X = rng.uniform(-2, 2, (n_points, 3)) + np.array([0, 0, 6.0])
    cameras = {
        1: rwm.Camera(id=1, model="PINHOLE", width=640, height=480,
                      params=np.array([800.0, 800.0, 320.0, 240.0]))
    }
    images = {}
    points3D = {}
    obs = {j: ([], []) for j in range(n_points)}
    for i in range(n_images):
        angle = 0.1 * i
        R = np.array(
            [
                [np.cos(angle), 0, np.sin(angle)],
                [0, 1, 0],
                [-np.sin(angle), 0, np.cos(angle)],
            ]
        )
        t = np.array([0.5 * i, 0.0, 0.0])
        Xc = X @ R.T + t
        x = Xc @ K.T
        xy = x[:, :2] / x[:, 2:]
        images[i + 1] = rwm.Image(
            id=i + 1, qvec=rotmat2qvec(R), tvec=t, camera_id=1,
            name=f"img{i}.jpg", xys=xy,
            point3D_ids=np.arange(n_points),
        )
        for j in range(n_points):
            obs[j][0].append(i + 1)
            obs[j][1].append(j)
    for j in range(n_points):
        points3D[j] = rwm.Point3D(
            id=j, xyz=X[j], rgb=np.array([128, 128, 128]), error=0.5,
            image_ids=np.array(obs[j][0]),
            point2D_idxs=np.array(obs[j][1]),
        )
    return K, cameras, images, points3D


@pytest.mark.parametrize("ext", [".txt", ".bin"])
def test_model_roundtrip(tmp_path, ext):
    _, cameras, images, points3D = make_synthetic_model(n_points=20,
                                                        n_images=2)
    rwm.write_model(cameras, images, points3D, tmp_path, ext=ext)
    c2, i2, p2 = rwm.read_model(tmp_path, ext=ext)
    assert set(c2) == set(cameras) and set(i2) == set(images)
    np.testing.assert_allclose(c2[1].params, cameras[1].params)
    np.testing.assert_allclose(i2[1].qvec, images[1].qvec, atol=1e-12)
    np.testing.assert_allclose(i2[1].xys, images[1].xys, atol=1e-6)
    np.testing.assert_allclose(p2[0].xyz, points3D[0].xyz, atol=1e-12)
    np.testing.assert_array_equal(p2[0].image_ids, points3D[0].image_ids)


def test_localize_sfm_end_to_end(tmp_path):
    """Synthetic model + synthetic matches → localize a held-out query with
    the on-device PnP; pose must match ground truth."""
    import h5py

    from imcui_tpu.pipeline import localize_sfm

    K, cameras, images, points3D = make_synthetic_model(n_points=150,
                                                        n_images=3)
    sfm_dir = tmp_path / "sfm"
    rwm.write_model(cameras, images, points3D, sfm_dir, ext=".bin")

    # ground-truth query pose
    rng = np.random.RandomState(1)
    angle = 0.25
    R_gt = np.array(
        [
            [np.cos(angle), 0, np.sin(angle)],
            [0, 1, 0],
            [-np.sin(angle), 0, np.cos(angle)],
        ]
    )
    t_gt = np.array([0.3, 0.1, 0.2])
    X = np.stack([points3D[j].xyz for j in range(150)])
    Xc = X @ R_gt.T + t_gt
    x = Xc @ K.T
    q_kpts = (x[:, :2] / x[:, 2:]) + rng.randn(150, 2) * 0.4

    feats = tmp_path / "feats.h5"
    with h5py.File(feats, "w") as fd:
        g = fd.create_group("query.jpg")
        g.create_dataset("keypoints", data=(q_kpts - 0.5).astype(np.float32))
        for img in images.values():
            g = fd.create_group(img.name)
            g.create_dataset("keypoints",
                             data=(img.xys - 0.5).astype(np.float32))

    matches = tmp_path / "matches.h5"
    from imcui_tpu.utils.io import names_to_pair

    with h5py.File(matches, "w") as fd:
        for img in images.values():
            g = fd.create_group(names_to_pair("query.jpg", img.name))
            m0 = np.arange(150, dtype=np.int16)  # kpt i ↔ db kpt i
            g.create_dataset("matches0", data=m0)
            g.create_dataset("matching_scores0",
                             data=np.ones(150, np.float16))

    retrieval = tmp_path / "retrieval.txt"
    retrieval.write_text(
        "\n".join(f"query.jpg {img.name}" for img in images.values())
    )
    queries = tmp_path / "queries.txt"
    queries.write_text("query.jpg PINHOLE 640 480 800 800 320 240\n")
    results = tmp_path / "results.txt"

    poses, logs = localize_sfm.main(
        sfm_dir, queries, retrieval, feats, matches, results,
        ransac_thresh=6.0,
    )
    assert "query.jpg" in poses
    qvec, tvec = poses["query.jpg"]
    R_est = qvec2rotmat(qvec)
    from imcui_tpu.ops.pose import rotation_angle_deg

    err_deg = float(rotation_angle_deg(R_est, R_gt))
    assert err_deg < 1.5, err_deg
    assert np.linalg.norm(tvec - t_gt) < 0.1
    assert results.exists()
    line = results.read_text().strip()
    assert line.startswith("query.jpg")
