"""Compile + step-time smoke of the LoFTR homography trainer on chip."""
import sys; sys.path.insert(0, "/root/repo")
import time
import jax, optax
from imcui_tpu.train import loftr as lft
from imcui_tpu.train import data
from imcui_tpu.models.matchers import loftr as lf

size, batch = 320, 4
opt = optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(3e-4))
params = lf.init_params(jax.random.PRNGKey(0))
st = opt.init(params)
step = lft.make_train_step(opt, h=size, w=size, batch=batch, n_fine=128)
key = jax.random.PRNGKey(1)
imgs = data.synthetic_images(key, batch, size, size)
t0 = time.time()
params, st, m = step(params, st, imgs, key)
jax.block_until_ready(m["loss"])
print("compile+first step", round(time.time() - t0, 1), "s")
t0 = time.time()
for i in range(5):
    key, ks = jax.random.split(key)
    params, st, m = step(params, st, imgs, ks)
jax.block_until_ready(m["loss"])
print("steady ms/step", round((time.time() - t0) / 5 * 1000, 1))
print({k: round(float(v), 4) for k, v in m.items()})
