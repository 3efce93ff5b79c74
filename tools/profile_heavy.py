"""Stage-wise profiles for the heavy tiers (RoMa, DUSt3R) on the real
chip, chained-fetch harness. Each stage is its own jit with on-device
random inputs at the stage's boundary shapes, so stage times sum to
(approximately) the end-to-end time modulo fusion across boundaries.

Usage: python tools/profile_heavy.py [duster|roma]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from imcui_tpu.utils.benchmark import chain_bench


def _bf16(t):
    return jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16)
        if a.dtype == jnp.float32 else a, t)


def run(label, step, params, iters=20, warmup=2):
    dt, _ = chain_bench(step, params, iters, warmup)
    print(f"{label}: {1000 * dt / iters:.2f} ms", flush=True)
    return dt / iters


def profile_duster():
    from imcui_tpu.models.matchers import duster

    R = 512
    conf = dict(duster.PUBLISHED, max_matches=2048, subsample=8)
    params = _bf16(duster.init_params(jax.random.PRNGKey(0), conf))
    hp = wp = R // conf["patch"]
    n = hp * wp

    def enc_step(params, key, acc):
        img = jax.random.uniform(key, (R, R, 3), jnp.bfloat16) * 2 - 1
        t, _ = duster.encode(params, img, conf)
        return acc + t.astype(jnp.float32).sum()

    def enc2_step(params, key, acc):  # both views (as in forward_pair)
        k0, k1 = jax.random.split(key)
        i0 = jax.random.uniform(k0, (R, R, 3), jnp.bfloat16) * 2 - 1
        i1 = jax.random.uniform(k1, (R, R, 3), jnp.bfloat16) * 2 - 1
        t0, _ = duster.encode(params, i0, conf)
        t1, _ = duster.encode(params, i1, conf)
        return acc + (t0 + t1).astype(jnp.float32).sum()

    def dec_step(params, key, acc):
        k0, k1 = jax.random.split(key)
        t0 = jax.random.normal(k0, (n, conf["enc_dim"]), jnp.bfloat16)
        t1 = jax.random.normal(k1, (n, conf["enc_dim"]), jnp.bfloat16)
        h0, h1 = duster.decode(params, t0, t1, (hp, wp), conf)
        return acc + (h0[-1] + h1[-1]).astype(jnp.float32).sum()

    def head_step(params, key, acc):
        ks = jax.random.split(key, 8)
        dims = (conf["enc_dim"], conf["dec_dim"], conf["dec_dim"],
                conf["dec_dim"])
        h0 = [jax.random.normal(ks[i], (n, dims[i]), jnp.bfloat16)
              for i in range(4)]
        h1 = [jax.random.normal(ks[4 + i], (n, dims[i]), jnp.bfloat16)
              for i in range(4)]
        p0, c0 = duster.head_to_pointmap(params["downstream_head1"], h0,
                                         (hp, wp), conf["patch"])
        p1, c1 = duster.head_to_pointmap(params["downstream_head2"], h1,
                                         (hp, wp), conf["patch"])
        return acc + p0.sum() + p1.sum() + c0.sum() + c1.sum()

    def nn_step(params, key, acc):
        ks = jax.random.split(key, 4)
        p0 = jax.random.normal(ks[0], (R, R, 3), jnp.float32)
        p1 = jax.random.normal(ks[1], (R, R, 3), jnp.float32)
        c0 = jax.random.uniform(ks[2], (R, R), jnp.float32) + 1.0
        c1 = jax.random.uniform(ks[3], (R, R), jnp.float32) + 1.0
        k0, k1, s, v = duster.reciprocal_nn_3d(
            p0, p1, c0, c1, max_matches=2048, subsample=8)
        return acc + s.sum() + k0.sum() + k1.sum()

    run("duster.encode x1", enc_step, params)
    run("duster.encode x2", enc2_step, params)
    run("duster.decode (dual, 12 blocks)", dec_step, params)
    run("duster.dpt heads x2", head_step, params)
    run("duster.reciprocal_nn", nn_step, params)


def profile_roma():
    import jax.numpy as jnp
    from imcui_tpu.models.matchers import roma
    from imcui_tpu.models.backbones import dinov2, vgg
    from imcui_tpu.models.layers import batch_norm_inference, conv2d

    R = 560
    conf = {"dinov2_variant": "vitl14"}
    params = _bf16(roma.init_params(jax.random.PRNGKey(0), conf))
    hp = wp = R // 14

    def dv_step(params, key, acc):
        k0, k1 = jax.random.split(key)
        i0 = jax.random.uniform(k0, (R, R, 3), jnp.bfloat16)
        i1 = jax.random.uniform(k1, (R, R, 3), jnp.bfloat16)
        d0, _ = dinov2.apply(params["dinov2"], i0, "vitl14")
        d1, _ = dinov2.apply(params["dinov2"], i1, "vitl14")
        return acc + (d0.astype(jnp.float32).sum()
                      + d1.astype(jnp.float32).sum())

    def vgg_step(params, key, acc):
        k0, k1 = jax.random.split(key)
        i0 = jax.random.uniform(k0, (R, R, 3), jnp.bfloat16)
        i1 = jax.random.uniform(k1, (R, R, 3), jnp.bfloat16)
        v0 = vgg.apply(params["encoder_cnn"], i0)
        v1 = vgg.apply(params["encoder_cnn"], i1)
        return acc + sum(v0[s].astype(jnp.float32).sum()
                         + v1[s].astype(jnp.float32).sum()
                         for s in v0)

    def gpdec_step(params, key, acc):
        k0, k1 = jax.random.split(key)
        f0 = jax.random.normal(k0, (hp, wp, 512), jnp.bfloat16)
        f1 = jax.random.normal(k1, (hp, wp, 512), jnp.bfloat16)
        emb1 = roma.fourier_embed(roma.coord_grid(hp, wp),
                                  params["gps"]["16"]["pos_conv"])
        gp_out = roma.gp_posterior(f0.reshape(hp * wp, -1),
                                   f1.reshape(hp * wp, -1), emb1)
        tokens = jnp.concatenate([gp_out, f0.reshape(hp * wp, -1)], -1)
        dec = params["embedding_decoder"]
        import jax.tree_util as tu
        from imcui_tpu.models.backbones import vit as vit_mod
        stacked = tu.tree_map(lambda *xs: jnp.stack(xs), *dec["blocks"])
        tokens, _ = jax.lax.scan(
            lambda t, blk: (vit_mod.encoder_block_apply(
                blk, t, roma.DECODER_HEADS), None), tokens, stacked)
        from imcui_tpu.models.layers import linear
        out = linear(dec["to_out"], tokens)
        warp = roma.cls_to_flow_refine(out[:, :-1]).reshape(hp, wp, 2)
        return acc + warp.sum() + out[:, -1].sum()

    def ref16_step(params, key, acc):
        ks = jax.random.split(key, 4)
        f0 = jax.random.normal(ks[0], (hp, wp, 512), jnp.bfloat16)
        f1 = jax.random.normal(ks[1], (hp, wp, 512), jnp.bfloat16)
        warp = jax.random.uniform(ks[2], (hp, wp, 2), jnp.float32) * 2 - 1
        cert = jax.random.uniform(ks[3], (hp, wp), jnp.float32)
        w2, c2 = roma.refiner_apply(params["conv_refiner"]["16"],
                                    roma.REFINERS["16"], f0, f1, warp,
                                    cert)
        return acc + w2.sum() + c2.sum()

    def fine_refs_step(params, key, acc):
        # scales 8/4/2/1 over the VGG pyramid incl. projections
        k0, k1, kw, kc = jax.random.split(key, 4)
        i0 = jax.random.uniform(k0, (R, R, 3), jnp.bfloat16)
        i1 = jax.random.uniform(k1, (R, R, 3), jnp.bfloat16)
        v0 = vgg.apply(params["encoder_cnn"], i0)
        v1 = vgg.apply(params["encoder_cnn"], i1)
        warp = jax.random.uniform(kw, (hp, wp, 2), jnp.float32) * 2 - 1
        cert = jax.random.uniform(kc, (hp, wp), jnp.float32)

        def proj(s, feat):
            p = params["proj"][s]
            return batch_norm_inference(p["1"],
                                        conv2d(p["0"], feat[None]))[0]
        for s in (8, 4, 2, 1):
            fs0 = proj(str(s), v0[s])
            fs1 = proj(str(s), v1[s])
            hs, ws, _ = fs0.shape
            warp = roma._resize(warp, hs, ws)
            cert = roma._resize(cert[..., None], hs, ws)[..., 0]
            warp, cert = roma.refiner_apply(
                params["conv_refiner"][str(s)], roma.REFINERS[str(s)],
                fs0, fs1, warp, cert)
        return acc + warp.sum() + cert.sum()

    run("roma.dinov2 x2", dv_step, params, iters=10)
    run("roma.vgg19 x2", vgg_step, params, iters=10)
    run("roma.gp+decoder", gpdec_step, params, iters=10)
    run("roma.refiner@16", ref16_step, params, iters=10)
    run("roma.vgg+fine refiners 8/4/2/1", fine_refs_step, params,
        iters=10)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "duster"
    if which == "duster":
        profile_duster()
    else:
        profile_roma()
