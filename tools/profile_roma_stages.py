"""RoMa whole-program refiner-scale attribution (round 4).

Same method as profile_duster_stages.py: full programs truncated at
successive pipeline points, differenced — immune to the ~2.4 ms/program
tunnel dispatch floor that made the r3 per-scale refiner probes
unresolvable (BASELINE.md "refiner-pyramid micro-probe").

Variants (B=1, 560x560x3, bf16 params+inputs, published vitl14 conf):
  enc     : DINOv2 x2 + VGG x2 (all encoder work)
  coarse  : + proj16 + GP + transformer decoder + cls_to_flow_refine
  r16     : + refiner@16
  r8/r4/r2: + fine refiners at those scales (incl. their proj/resizes)
  full    : + refiner@1 + sigmoid + sample  == bench row

Usage: python tools/profile_roma_stages.py [enc coarse r16 r8 r4 r2 full]
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from imcui_tpu.utils.benchmark import chain_bench

R = 560


def _tree_sum(t):
    leaves = [x.astype(jnp.float32).sum() for x in jax.tree_util.tree_leaves(t)]
    return sum(leaves[1:], leaves[0])


def main(stages):
    from imcui_tpu.models.backbones import dinov2, vgg
    from imcui_tpu.models.backbones import vit as vit_mod
    from imcui_tpu.models.matchers import roma
    from imcui_tpu.models.layers import batch_norm_inference, conv2d

    conf = {"dinov2_variant": "vitl14"}
    params = roma.init_params(jax.random.PRNGKey(0), conf)
    params = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
        params)

    def inputs(key):
        k0, k1 = jax.random.split(key)
        i0 = jax.random.uniform(k0, (R, R, 3), jnp.bfloat16)
        i1 = jax.random.uniform(k1, (R, R, 3), jnp.bfloat16)
        return i0, i1

    def proj(params, s, feat):
        p = params["proj"][s]
        return batch_norm_inference(p["1"], conv2d(p["0"], feat[None]))[0]

    def front(params, i0, i1, upto_scale):
        """match_gp truncated after refiner at ``upto_scale`` (None =
        after the transformer decoder; 99 = encoders only)."""
        d0, (hp, wp) = dinov2.apply(params["dinov2"], i0, "vitl14")
        d1, _ = dinov2.apply(params["dinov2"], i1, "vitl14")
        v0 = vgg.apply(params["encoder_cnn"], i0)
        v1 = vgg.apply(params["encoder_cnn"], i1)
        if upto_scale == 99:
            return _tree_sum((d0, d1, v0, v1))
        f0_16 = proj(params, "16", d0.reshape(hp, wp, -1))
        f1_16 = proj(params, "16", d1.reshape(hp, wp, -1))
        emb1 = roma.fourier_embed(roma.coord_grid(hp, wp),
                                  params["gps"]["16"]["pos_conv"])
        gp_out = roma.gp_posterior(f0_16.reshape(hp * wp, -1),
                                   f1_16.reshape(hp * wp, -1), emb1)
        tokens = jnp.concatenate([gp_out, f0_16.reshape(hp * wp, -1)], -1)
        dec = params["embedding_decoder"]
        dec_stacked = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *dec["blocks"])
        tokens, _ = jax.lax.scan(
            lambda t, blk: (vit_mod.encoder_block_apply(
                blk, t, roma.DECODER_HEADS), None),
            tokens, dec_stacked)
        out = jnp.einsum("nd,do->no", tokens, dec["to_out"]["w"]
                         ) + dec["to_out"]["b"]
        warp = roma.cls_to_flow_refine(out[:, :-1]).reshape(hp, wp, 2)
        cert = out[:, -1].reshape(hp, wp)
        if upto_scale is None:
            return _tree_sum((warp, cert))
        warp, cert = roma.refiner_apply(
            params["conv_refiner"]["16"], roma.REFINERS["16"],
            f0_16, f1_16, warp, cert)
        for s in (8, 4, 2, 1):
            if upto_scale == 16:
                break
            fs0 = proj(params, str(s), v0[s])
            fs1 = proj(params, str(s), v1[s])
            hs, ws, _ = fs0.shape
            warp = roma._resize(warp, hs, ws)
            cert = roma._resize(cert[..., None], hs, ws)[..., 0]
            warp, cert = roma.refiner_apply(
                params["conv_refiner"][str(s)], roma.REFINERS[str(s)],
                fs0, fs1, warp, cert)
            if s == upto_scale:
                break
        return _tree_sum((warp, cert))

    scale_of = {"enc": 99, "coarse": None, "r16": 16, "r8": 8, "r4": 4,
                "r2": 2, "full": 1}
    results = {}
    for name in stages:
        upto = scale_of[name]

        def step(params, key, acc, upto=upto):
            i0, i1 = inputs(key)
            return acc + front(params, i0, i1, upto)

        dt, _ = chain_bench(step, params, iters=15, warmup=2,
                            key_base=hash(name) % 1000)
        results[name] = round(1000 * dt / 15, 2)
        print(json.dumps({"stage": name, "ms": results[name]}), flush=True)
    print(json.dumps({"profile": results}), flush=True)


if __name__ == "__main__":
    main(sys.argv[1:] or ["enc", "coarse", "r16", "r8", "r4", "r2", "full"])
