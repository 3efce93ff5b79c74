"""Self-supervised matcher training (beyond-reference capability).

The reference webui is inference-only — every model arrives pretrained
(imcui/hloc/utils/base_model.py:37-43 downloads checkpoints; no train
loop exists anywhere in the reference tree). This package adds the
training recipe those checkpoints came from, TPU-native: the published
LightGlue homography pre-training stage (Lindenberger et al., ICCV
2023, §4 "Training" — frozen detector, random homography pairs,
deep-supervised assignment log-likelihood + token-confidence heads),
expressed as ONE jitted XLA program per optimisation step that shards
dp over the pair batch and tp over the matcher's hidden dims on a
`jax.sharding.Mesh` (parallel/mesh.py rules), with `jax.checkpoint`
rematerialisation on every transformer layer.
"""

from . import data, homography, losses, step, superpoint  # noqa: F401
