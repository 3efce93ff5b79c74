"""Decompose duster.reciprocal_nn_3d's 8.7 ms (r3 profile): distance
matrix + argmins vs top_k vs full, plus a bf16-dot variant.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from imcui_tpu.models.matchers import duster
from imcui_tpu.utils.benchmark import chain_bench

N = 4096  # 64x64 subsampled grid


def inputs(key):
    ks = jax.random.split(key, 4)
    p0 = jax.random.normal(ks[0], (N, 3), jnp.float32)
    p1 = jax.random.normal(ks[1], (N, 3), jnp.float32)
    c0 = jax.random.uniform(ks[2], (N,), jnp.float32) + 1.0
    c1 = jax.random.uniform(ks[3], (N,), jnp.float32) + 1.0
    return p0, p1, c0, c1


def d2_of(p0, p1, dtype=jnp.float32):
    return ((p0 ** 2).sum(-1)[:, None] + (p1 ** 2).sum(-1)[None, :]
            - 2.0 * jnp.einsum("nd,md->nm", p0.astype(dtype),
                               p1.astype(dtype),
                               preferred_element_type=jnp.float32))


def v_full(_, key, acc):
    p0, p1, c0, c1 = inputs(key)
    k0, k1, s, v = duster.reciprocal_nn_3d(
        p0.reshape(64, 64, 3).repeat(8, 0).repeat(8, 1),
        p1.reshape(64, 64, 3).repeat(8, 0).repeat(8, 1),
        c0.reshape(64, 64).repeat(8, 0).repeat(8, 1),
        c1.reshape(64, 64).repeat(8, 0).repeat(8, 1),
        max_matches=2048, subsample=8)
    return acc + s.sum() + k0.sum()


def v_d2_argmin(_, key, acc):
    p0, p1, c0, c1 = inputs(key)
    d2 = d2_of(p0, p1)
    nn01 = jnp.argmin(d2, 1)
    nn10 = jnp.argmin(d2, 0)
    return acc + nn01.sum().astype(jnp.float32) \
        + nn10.sum().astype(jnp.float32)


def v_d2_only(_, key, acc):
    p0, p1, c0, c1 = inputs(key)
    d2 = d2_of(p0, p1)
    return acc + d2.sum()


def v_topk(_, key, acc):
    p0, p1, c0, c1 = inputs(key)
    score = c0 * c1
    top, idx = jax.lax.top_k(score, 2048)
    return acc + top.sum() + idx.sum().astype(jnp.float32)


def v_argmin_via_minval(_, key, acc):
    # argmin as (min, index) one-pass via reduce over iota-packed pairs
    p0, p1, c0, c1 = inputs(key)
    d2 = d2_of(p0, p1)
    m1 = d2.min(1)
    nn01 = jnp.argmax(d2 == m1[:, None], 1)
    m0 = d2.min(0)
    nn10 = jnp.argmax(d2 == m0[None, :], 0)
    return acc + nn01.sum().astype(jnp.float32) \
        + nn10.sum().astype(jnp.float32)


for name, fn in (("full", v_full), ("d2_only", v_d2_only),
                 ("d2+argmin2", v_d2_argmin),
                 ("d2+min/eq-argmax", v_argmin_via_minval),
                 ("topk2048", v_topk)):
    dt, _ = chain_bench(fn, None, iters=30, warmup=2)
    print(f"{name}: {1000 * dt / 30:.3f} ms", flush=True)
