"""SfM reconstruction pipeline (reference contract:
imcui/hloc/reconstruction.py:20-149 — same main() signature and stages:
create db → import images/features/matches → geometric verification →
incremental mapping → keep largest model).

TPU-first split: everything up to and including two-view geometric
verification runs in this framework (our COLMAP-format SQLite writer +
the on-device batched RANSAC replaces ``pycolmap.
estimation_and_geometric_verification``). The incremental bundle-adjusting
mapper itself remains an external CPU dependency behind this interface
(pycolmap if installed — reference uses pycolmap.incremental_mapping at
reconstruction.py:78); without it we stop after verification with a ready
database and a clear error.
"""

from pathlib import Path

import numpy as np

from .. import logger
from ..utils.database import COLMAPDatabase, image_ids_to_pair_id
from ..utils.io import get_keypoints, get_matches, names_to_pair  # noqa: F401
from ..utils.parsers_compat import parse_pairs_file

try:
    import pycolmap
except ImportError:  # gated external dependency
    pycolmap = None


def create_empty_db(database_path):
    if Path(database_path).exists():
        logger.warning("The database already exists, deleting it.")
        Path(database_path).unlink()
    logger.info("Creating an empty database...")
    db = COLMAPDatabase.connect(database_path)
    db.create_tables()
    db.commit()
    db.close()


def import_images(image_dir, database_path, camera_mode="AUTO",
                  image_list=None, options=None):
    """Register images with a shared SIMPLE_RADIAL camera per unique size
    (the pycolmap import path is used when available for EXIF handling)."""
    logger.info("Importing images into the database...")
    if pycolmap is not None:
        if options is None:
            options = {}
        with pycolmap.ostream():
            pycolmap.import_images(
                database_path, image_dir, camera_mode,
                image_list=image_list or [], options=options,
            )
        return
    import cv2

    from .extract_features import list_images

    names = image_list or list_images(image_dir)
    db = COLMAPDatabase.connect(database_path)
    cameras = {}
    for name in names:
        img = cv2.imread(str(Path(image_dir) / name))
        if img is None:
            raise ValueError(f"Cannot read image {name}")
        h, w = img.shape[:2]
        key = (w, h)
        if camera_mode == "SINGLE":
            key = "single"
        if key not in cameras:
            f = 1.2 * max(w, h)
            cameras[key] = db.add_camera(
                2, w, h, np.array([f, w / 2.0, h / 2.0, 0.0])
            )  # SIMPLE_RADIAL
        db.add_image(name, cameras[key])
    db.commit()
    db.close()


def get_image_ids(database_path):
    db = COLMAPDatabase.connect(database_path)
    images = {}
    for name, image_id in db.execute("SELECT name, image_id FROM images;"):
        images[name] = image_id
    db.close()
    return images


def import_features(image_ids, database_path, features_path):
    logger.info("Importing features into the database...")
    db = COLMAPDatabase.connect(database_path)
    for image_name, image_id in image_ids.items():
        keypoints = get_keypoints(features_path, image_name)
        keypoints += 0.5  # COLMAP origin convention
        db.add_keypoints(image_id, keypoints)
    db.commit()
    db.close()


def import_matches(image_ids, database_path, pairs_path, matches_path,
                   min_match_score=None, skip_geometric_verification=False):
    logger.info("Importing matches into the database...")
    pairs = parse_pairs_file(pairs_path)
    db = COLMAPDatabase.connect(database_path)
    matched = set()
    for name0, name1 in pairs:
        id0, id1 = image_ids[name0], image_ids[name1]
        if len({(id0, id1), (id1, id0)} & matched) > 0:
            continue
        matches, scores = get_matches(matches_path, name0, name1)
        if min_match_score:
            matches = matches[scores > min_match_score]
        db.add_matches(id0, id1, matches)
        matched |= {(id0, id1), (id1, id0)}
        if skip_geometric_verification:
            db.add_two_view_geometry(id0, id1, matches)
    db.commit()
    db.close()


def geometric_verification(image_ids, database_path, pairs_path,
                           features_path, threshold=4.0):
    """Two-view geometric verification with the on-device batched RANSAC
    (replaces pycolmap.estimation_and_geometric_verification; reference
    calls it at reconstruction.py:72 with max 20000 trials)."""
    import jax
    import jax.numpy as jnp

    from ..ops.ransac import ransac

    logger.info("Performing on-device geometric verification of matches...")
    pairs = parse_pairs_file(pairs_path)
    db = COLMAPDatabase.connect(database_path)
    done = set()
    for i, (name0, name1) in enumerate(pairs):
        id0, id1 = image_ids[name0], image_ids[name1]
        pid = image_ids_to_pair_id(id0, id1)
        if pid in done:
            continue
        done.add(pid)
        row = db.execute(
            "SELECT data, rows FROM matches WHERE pair_id=?;", (pid,)
        ).fetchone()
        if row is None or row[1] == 0:
            db.add_two_view_geometry(id0, id1, np.zeros((0, 2), np.uint32))
            continue
        matches = np.frombuffer(row[0], np.uint32).reshape(-1, 2)
        if id0 > id1:  # stored flipped
            matches = matches[:, ::-1]
        kp0 = get_keypoints(features_path, name0)[matches[:, 0]]
        kp1 = get_keypoints(features_path, name1)[matches[:, 1]]
        n = len(kp0)
        if n < 8:
            db.add_two_view_geometry(id0, id1, np.zeros((0, 2), np.uint32))
            continue
        n_pad = max(64, int(2 ** np.ceil(np.log2(n))))
        p0 = np.zeros((n_pad, 2), np.float32)
        p1 = np.zeros((n_pad, 2), np.float32)
        m = np.zeros((n_pad,), bool)
        p0[:n], p1[:n], m[:n] = kp0, kp1, True
        out = ransac(
            jax.random.PRNGKey(i), jnp.asarray(p0), jnp.asarray(p1),
            jnp.asarray(m), model="fundamental", threshold=threshold,
            num_hypotheses=1024,
        )
        inl = np.asarray(out["inliers"])[:n]
        F = np.asarray(out["M"], np.float64)
        db.add_two_view_geometry(
            id0, id1, matches[inl].astype(np.uint32), F=F, config=3,
        )
    db.commit()
    db.close()


def run_reconstruction(sfm_dir, database_path, image_dir, verbose=False,
                       options=None):
    """Incremental mapping (external CPU backend; reference:
    reconstruction.py:50-103)."""
    if pycolmap is None:
        raise ImportError(
            "Incremental mapping requires pycolmap (or COLMAP). The "
            "database with verified two-view geometries has been written "
            f"to {database_path}; run COLMAP's mapper on it externally."
        )
    models_path = Path(sfm_dir) / "models"
    models_path.mkdir(exist_ok=True, parents=True)
    logger.info("Running 3D reconstruction...")
    if options is None:
        options = {}
    with pycolmap.ostream():
        reconstructions = pycolmap.incremental_mapping(
            database_path, image_dir, models_path, options=options
        )
    if len(reconstructions) == 0:
        logger.error("Could not reconstruct any model!")
        return None
    logger.info(f"Reconstructed {len(reconstructions)} model(s).")
    largest_index = None
    largest_num_images = 0
    for index, rec in reconstructions.items():
        num_images = rec.num_reg_images()
        if num_images > largest_num_images:
            largest_index = index
            largest_num_images = num_images
    assert largest_index is not None
    logger.info(
        f"Largest model is #{largest_index} with "
        f"{largest_num_images} images."
    )
    import shutil

    for filename in ["images.bin", "cameras.bin", "points3D.bin"]:
        if (sfm_dir / filename).exists():
            (sfm_dir / filename).unlink()
        shutil.move(
            str(models_path / str(largest_index) / filename),
            str(sfm_dir),
        )
    return reconstructions[largest_index]


def main(sfm_dir, image_dir, pairs, features, matches,
         camera_mode="AUTO", verbose=False, skip_geometric_verification=False,
         min_match_score=None, image_list=None, image_options=None,
         mapper_options=None):
    """Reference parity: imcui/hloc/reconstruction.py:106-149."""
    assert Path(features).exists(), features
    assert Path(pairs).exists(), pairs
    assert Path(matches).exists(), matches

    sfm_dir = Path(sfm_dir)
    sfm_dir.mkdir(parents=True, exist_ok=True)
    database = sfm_dir / "database.db"

    create_empty_db(database)
    import_images(image_dir, database, camera_mode, image_list,
                  image_options)
    image_ids = get_image_ids(database)
    import_features(image_ids, database, features)
    import_matches(image_ids, database, pairs, matches, min_match_score,
                   skip_geometric_verification)
    if not skip_geometric_verification:
        geometric_verification(image_ids, database, pairs, features)
    reconstruction = run_reconstruction(
        sfm_dir, database, image_dir, verbose, mapper_options
    )
    if reconstruction is not None:
        logger.info(
            f"Reconstruction statistics:\n{reconstruction.summary()}"
            + f"\n\tnum_input_images = {len(image_ids)}"
        )
    return reconstruction
