"""All-vs-all / query-vs-ref pair generation (reference contract:
imcui/hloc/pairs_from_exhaustive.py:11-50)."""

from pathlib import Path

from .. import logger
from ..utils.io import list_h5_names, parse_image_list


def main(output, image_list=None, features=None, ref_list=None,
         ref_features=None):
    if image_list is not None:
        if isinstance(image_list, (str, Path)):
            names_q = parse_image_list(image_list)
        else:
            names_q = list(image_list)
    elif features is not None:
        names_q = list_h5_names(features)
    else:
        raise ValueError("Provide either a list of images or a feature file.")

    self_matching = False
    if ref_list is not None:
        if isinstance(ref_list, (str, Path)):
            names_ref = parse_image_list(ref_list)
        else:
            names_ref = list(ref_list)
    elif ref_features is not None:
        names_ref = list_h5_names(ref_features)
    else:
        self_matching = True
        names_ref = names_q

    pairs = []
    for i, n1 in enumerate(names_q):
        for j, n2 in enumerate(names_ref):
            if self_matching and j <= i:
                continue
            pairs.append((n1, n2))

    logger.info(f"Found {len(pairs)} pairs.")
    with open(output, "w") as f:
        f.write("\n".join(" ".join(p) for p in pairs))
    return pairs
