"""HDF5 feature/match file I/O + pair parsing.

File-format compatible with the reference so downstream tools (COLMAP
import, hloc pipelines) can consume our outputs directly
(reference: imcui/hloc/utils/io.py:11-84, imcui/hloc/utils/parsers.py:11-59).
"""

from pathlib import Path

import h5py
import numpy as np


def list_h5_names(path):
    """All dataset group names in an HDF5 file (reference parity:
    imcui/hloc/utils/io.py:27-36)."""
    names = []
    with h5py.File(str(path), "r", libver="latest") as fd:

        def visit_fn(_, obj):
            if isinstance(obj, h5py.Dataset):
                names.append(obj.parent.name.strip("/"))

        fd.visititems(visit_fn)
    return list(set(names))


def get_keypoints(path, name, return_uncertainty=False):
    """Read keypoints (+optional uncertainty attr) for one image
    (reference parity: imcui/hloc/utils/io.py:39-46)."""
    with h5py.File(str(path), "r", libver="latest") as hfile:
        dset = hfile[name]["keypoints"]
        p = dset.__array__()
        uncertainty = dset.attrs.get("uncertainty")
    if return_uncertainty:
        return p, uncertainty
    return p


def names_to_pair(name0, name1, separator="/"):
    """Canonical HDF5 group name for a pair (reference parity:
    imcui/hloc/utils/parsers.py:45-46)."""
    return separator.join((name0.replace("/", "-"), name1.replace("/", "-")))


def names_to_pair_old(name0, name1):
    return names_to_pair(name0, name1, separator="_")


def find_pair(hfile, name0, name1):
    """Locate a pair group under any of the 4 legacy name orders
    (reference parity: imcui/hloc/utils/io.py:49-62)."""
    pair = names_to_pair(name0, name1)
    if pair in hfile:
        return pair, False
    pair = names_to_pair(name1, name0)
    if pair in hfile:
        return pair, True
    pair = names_to_pair_old(name0, name1)
    if pair in hfile:
        return pair, False
    pair = names_to_pair_old(name1, name0)
    if pair in hfile:
        return pair, True
    raise ValueError(
        f"Could not find pair {(name0, name1)}... "
        "Maybe you matched with a different list of pairs?"
    )


def get_matches(path, name0, name1):
    """Read matches as N×2 index pairs + scores (reference parity:
    imcui/hloc/utils/io.py:65-77)."""
    with h5py.File(str(path), "r", libver="latest") as hfile:
        pair, reverse = find_pair(hfile, name0, name1)
        matches = hfile[pair]["matches0"].__array__()
        scores = hfile[pair]["matching_scores0"].__array__()
    idx = np.where(matches != -1)[0]
    matches = np.stack([idx, matches[idx]], -1)
    if reverse:
        matches = np.flip(matches, -1)
    scores = scores[idx]
    return matches, scores


def parse_retrieval(path):
    """Parse a retrieval/pairs file into {query: [refs]} (reference parity:
    imcui/hloc/utils/parsers.py:33-42)."""
    retrieval = {}
    with open(path) as f:
        for p in f.read().rstrip("\n").split("\n"):
            if len(p) == 0:
                continue
            q, r = p.split()
            retrieval.setdefault(q, []).append(r)
    return retrieval


def parse_image_list(path, with_intrinsics=False):
    """Parse an image-list file; optionally parse COLMAP-style intrinsics
    (reference: imcui/hloc/utils/parsers.py:11-26). Intrinsics are returned
    as plain dicts (``pycolmap.Camera`` analog) since pycolmap is optional."""
    images = []
    with open(path) as f:
        for line in f.read().rstrip("\n").split("\n"):
            line = line.strip()
            if len(line) == 0 or line[0] == "#":
                continue
            if with_intrinsics:
                name, model, width, height, *params = line.split()
                camera = {
                    "model": model,
                    "width": int(width),
                    "height": int(height),
                    "params": np.array(params, float),
                }
                images.append((name, camera))
            else:
                images.append(line.split()[0])
    assert len(images) > 0, f"Could not find any image in the list {path}."
    return images


def parse_image_lists(paths, with_intrinsics=False):
    """Glob + parse several image lists (reference parity:
    imcui/hloc/utils/parsers.py:29-36)."""
    images = []
    files = list(Path(paths.parent if isinstance(paths, Path) else ".").glob(
        paths.name if isinstance(paths, Path) else paths))
    assert len(files) > 0, f"No image lists found at {paths}"
    for lfile in files:
        images += parse_image_list(lfile, with_intrinsics=with_intrinsics)
    return images


def read_yaml(path):
    import yaml

    with open(path) as f:
        return yaml.safe_load(f)
