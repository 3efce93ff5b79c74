"""Config registry (L2 analog).

Same shape as the reference registry (reference:
imcui/hloc/configs/__init__.py, configs/extractors.py:9-392,
configs/matchers.py:8-890): name → {output, model{name,…},
preprocessing{…}, [max_error, cell_size]}. Pure data.
"""

from .extractors import confs as extractor_confs
from .matchers import confs as matcher_confs

confs_dict = {
    "extractors": extractor_confs,
    "matchers": matcher_confs,
}
