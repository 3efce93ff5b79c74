"""VGG19 fine-feature pyramid (RoMa/DKM's trainable CNN encoder).

RoMa pairs the frozen DINOv2 coarse features with a VGG19 pyramid that
supplies the refinement features at strides 1/2/4/8 (reference wrapper:
imcui/hloc/matchers/roma.py — the network lives in the RoMa submodule,
whose encoder wraps ``torchvision.vgg19().features`` and collects the
activation entering each max-pool). Param names mirror the torchvision
layer indices (``layers.{i}``) so the upstream ``encoder.cnn.*`` weights
convert mechanically.
"""

import jax
import jax.numpy as jnp

from ..layers import conv2d, init_conv, max_pool, relu

# torchvision vgg19().features layout up to pool4 (index: conv cin→cout);
# scale-s features are the activations entering pool log2(s)+1
VGG19_CONVS = [
    (0, 3, 64), (2, 64, 64),                       # → feats[1]
    (5, 64, 128), (7, 128, 128),                   # → feats[2]
    (10, 128, 256), (12, 256, 256), (14, 256, 256), (16, 256, 256),
    (19, 256, 512), (21, 512, 512), (23, 512, 512), (25, 512, 512),
]
POOL_AFTER = {2, 7, 16}     # pool follows these conv indices (pre-collect)
COLLECT_AFTER = {2: 1, 7: 2, 16: 4, 25: 8}  # conv idx → pyramid stride

FEAT_DIMS = {1: 64, 2: 128, 4: 256, 8: 512}


def init_params(rng):
    params = {"layers": {}}
    keys = jax.random.split(rng, len(VGG19_CONVS))
    for key, (idx, cin, cout) in zip(keys, VGG19_CONVS):
        params["layers"][str(idx)] = init_conv(key, 3, 3, cin, cout)
    return params


def apply(params, image):
    """image: (H, W, 3) in [0,1] → {1: (H,W,64), 2: (H/2,W/2,128),
    4: (H/4,W/4,256), 8: (H/8,W/8,512)}."""
    x = image[None]
    feats = {}
    for idx, cin, cout in VGG19_CONVS:
        x = relu(conv2d(params["layers"][str(idx)], x))
        if idx in COLLECT_AFTER:
            feats[COLLECT_AFTER[idx]] = x[0]
        if idx in POOL_AFTER:
            x = max_pool(x)
    return feats
