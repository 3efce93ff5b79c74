"""Retrieval-based pair generation (reference contract:
imcui/hloc/pairs_from_retrieval.py:74-118 — same flags and file format).

TPU-first: the descriptor similarity is one MXU einsum over the whole
query×db matrix, and the top-k with self/score masking runs on device
(reference computes the einsum on torch: pairs_from_retrieval.py:109).
"""

from pathlib import Path

import h5py
import jax.numpy as jnp
import numpy as np

from .. import logger
from ..utils.io import list_h5_names, parse_image_list
from ..utils.parsers_compat import parse_pairs_file  # noqa: F401


def get_descriptors(names, path, name2idx=None, key="global_descriptor"):
    if name2idx is None:
        with h5py.File(str(path), "r", libver="latest") as fd:
            desc = [fd[n][key].__array__() for n in names]
    else:
        desc = []
        for n in names:
            with h5py.File(str(path[name2idx[n]]), "r",
                           libver="latest") as fd:
                desc.append(fd[n][key].__array__())
    return np.stack(desc, 0).astype(np.float32)


def pairs_from_score_matrix(scores, invalid, num_select,
                            min_score=None):
    """Top-k selection under a mask (reference parity:
    imcui/hloc/pairs_from_retrieval.py:50-71)."""
    assert scores.shape == invalid.shape
    scores = jnp.asarray(scores)
    invalid = jnp.asarray(invalid)
    if min_score is not None:
        invalid = invalid | (scores < min_score)
    scores = jnp.where(invalid, -jnp.inf, scores)
    topk = jnp.argsort(-scores, axis=1)[:, :num_select]
    valid = jnp.take_along_axis(scores, topk, 1) > -jnp.inf
    pairs = [
        (int(i), int(j))
        for i, row in enumerate(np.asarray(topk))
        for j, ok in zip(row, np.asarray(valid)[i])
        if ok
    ]
    return pairs


def main(descriptors, output, num_matched, query_prefix=None,
         query_list=None, db_prefix=None, db_list=None, db_model=None,
         db_descriptors=None, min_score=None):
    """Reference parity: imcui/hloc/pairs_from_retrieval.py:74-118."""
    logger.info("Extracting image pairs from a retrieval database.")

    if db_descriptors is None:
        db_descriptors = descriptors
    if isinstance(db_descriptors, (Path, str)):
        db_descriptors = [db_descriptors]
    name2db = {
        n: i for i, p in enumerate(db_descriptors)
        for n in list_h5_names(p)
    }
    db_names_h5 = list(name2db.keys())
    query_names_h5 = list_h5_names(descriptors)

    def parse_names(prefix, names, names_all):
        if prefix is not None:
            if not isinstance(prefix, (list, tuple)):
                prefix = [prefix]
            names = [n for n in names_all
                     if any(n.startswith(p) for p in prefix)]
        elif names is not None:
            if isinstance(names, (str, Path)):
                names = parse_image_list(names)
        else:
            names = names_all
        return names

    if db_model is not None:
        from ..utils.read_write_model import read_images_binary

        images = read_images_binary(Path(db_model) / "images.bin")
        db_names = [i.name for i in images.values()]
    else:
        db_names = parse_names(db_prefix, db_list, db_names_h5)
    if len(db_names) == 0:
        raise ValueError("Could not find any database image.")
    query_names = parse_names(query_prefix, query_list, query_names_h5)

    device_db = get_descriptors(db_names, db_descriptors, name2db)
    device_q = get_descriptors(query_names, descriptors)
    sim = jnp.einsum(
        "id,jd->ij", jnp.asarray(device_q), jnp.asarray(device_db),
        preferred_element_type=jnp.float32,
    )

    # avoid self-matching
    self_mask = np.array(query_names)[:, None] == np.array(db_names)[None]
    pairs = pairs_from_score_matrix(sim, jnp.asarray(self_mask),
                                    num_matched, min_score=min_score)
    pairs = [(query_names[i], db_names[j]) for i, j in pairs]

    logger.info(f"Found {len(pairs)} pairs.")
    with open(output, "w") as f:
        f.write("\n".join(" ".join(p) for p in pairs))
    return pairs
