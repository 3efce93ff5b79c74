"""Attention primitives for the attentional matchers (LightGlue/SuperGlue).

TPU-first notes:
- The logits einsums map straight onto the MXU; masks are additive -inf so
  padded keypoints never contribute (fixed shapes, one executable).
- Rotary position encoding is applied as a 2-D rotation over feature pairs
  (LightGlue's positional scheme).
- ``flash_attention`` provides a Pallas blockwise kernel for long keypoint
  sets; the XLA path is used for small N or on CPU (the kernel dispatches
  automatically).

Reference contract: the matchers consuming these are rebuilt from
imcui/hloc/matchers/lightglue.py:14-75 and matchers/superglue.py:13-43.
"""

import functools
import os

import jax
import jax.numpy as jnp

NEG_INF = -1e9

# IMCUI_ATTN_XLA=1 forces the differentiable XLA restatements everywhere
# (no pallas_call in the traced program). Escape hatch for TRAINING-step
# compiles on XLA:TPU: vmapped pallas_call + custom-VJP under jax.checkpoint
# multiplies program size and has produced pathological (>35 min, tunnel-
# wedging) compiles; the XLA path compiles in normal time and is the exact
# math the custom VJPs already differentiate through. Serving is unaffected
# unless the env var is set.
FORCE_XLA = os.environ.get("IMCUI_ATTN_XLA", "0") == "1"


def make_additive_mask(mask_q, mask_k):
    """(Nq,), (Nk,) bool → (Nq, Nk) additive float mask."""
    m = mask_q[:, None] & mask_k[None, :]
    return jnp.where(m, 0.0, NEG_INF)


def mha(q, k, v, mask_k=None, bias=None):
    """Masked multi-head attention.

    q: (H, Nq, Dh), k/v: (H, Nk, Dh); mask_k: (Nk,) bool validity.
    Returns (H, Nq, Dh).
    """
    dh = q.shape[-1]
    logits = jnp.einsum(
        "hqd,hkd->hqk", q, k, preferred_element_type=jnp.float32
    ) / jnp.sqrt(dh).astype(jnp.float32)
    if bias is not None:
        logits = logits + bias
    if mask_k is not None:
        logits = jnp.where(mask_k[None, None, :], logits, NEG_INF)
    attn = jax.nn.softmax(logits, axis=-1)
    # readout in the input dtype (bf16 probs are standard practice and the
    # f32 readout matmul was 4× off MXU peak); accumulation stays f32
    return jnp.einsum(
        "hqk,hkd->hqd", attn.astype(q.dtype), v,
        preferred_element_type=jnp.float32,
    ).astype(q.dtype)


def rotate_half_pairs(x):
    """Rotate interleaved pairs: (x1, x2) → (-x2, x1) over the last dim,
    treating the last dim as [..., 2] pairs (LightGlue convention)."""
    x = x.reshape(*x.shape[:-1], -1, 2)
    x1, x2 = x[..., 0], x[..., 1]
    out = jnp.stack([-x2, x1], axis=-1)
    return out.reshape(*out.shape[:-2], -1)


def apply_rotary(x, encoding):
    """Apply rotary embedding. x: (..., N, D); encoding: (cos, sin) each
    (N, D) (already repeated across pairs)."""
    cos, sin = encoding
    return x * cos + rotate_half_pairs(x) * sin


def learnable_fourier_encoding(kpts, Wr, gamma=1.0):
    """LightGlue's learnable Fourier positional encoding → rotary (cos, sin).

    kpts: (N, 2) normalized keypoints; Wr: (2, F) projection with
    F = head_dim / 2. Returns cos, sin each (N, 2F) with pair-interleaved
    repetition so they align with rotate_half_pairs.
    """
    projected = kpts @ (Wr / gamma)  # (N, F)
    cos = jnp.cos(projected)
    sin = jnp.sin(projected)
    # interleave-repeat each frequency for the (x1, x2) pair
    cos = jnp.repeat(cos, 2, axis=-1)
    sin = jnp.repeat(sin, 2, axis=-1)
    return cos, sin


# ---------------------------------------------------------------------------
# Pallas blockwise (flash) attention for TPU
# ---------------------------------------------------------------------------

def _flash_attn_kernel(q_ref, k_ref, v_ref, maskk_ref, o_ref, *, blk_k, n_k, scale):
    """One (head, q-block) program: stream K/V blocks, online softmax."""
    from jax import lax

    q = q_ref[0].astype(jnp.float32)  # (blk_q, dh)
    blk_q, dh = q.shape

    def body(i, carry):
        acc, m_i, l_i = carry
        k = k_ref[0, pl.ds(i * blk_k, blk_k), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(i * blk_k, blk_k), :].astype(jnp.float32)
        mk = maskk_ref[0, 0, pl.ds(i * blk_k, blk_k)]
        s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale
        s = jnp.where(mk[None, :] > 0, s, NEG_INF)
        m_new = jnp.maximum(m_i, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_i - m_new)
        l_new = l_i * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jnp.dot(p, v, preferred_element_type=jnp.float32)
        return acc, m_new, l_new

    acc0 = jnp.zeros((blk_q, dh), jnp.float32)
    m0 = jnp.full((blk_q, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((blk_q, 1), jnp.float32)
    acc, m_i, l_i = lax.fori_loop(0, n_k, body, (acc0, m0, l0))
    o_ref[0] = (acc / jnp.maximum(l_i, 1e-20)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("blk_q", "blk_k"))
def flash_attention(q, k, v, mask_k, blk_q=256, blk_k=256):
    """Blockwise attention (Pallas on TPU, XLA fallback elsewhere).

    q: (H, Nq, Dh), k/v: (H, Nk, Dh), mask_k: (Nk,) bool.
    Memory: O(blk_q · Nk) per program instead of O(Nq · Nk) — the win at
    4k–16k keypoints where full logits would thrash HBM.
    """
    if FORCE_XLA or jax.default_backend() != "tpu":
        return mha(q, k, v, mask_k=mask_k)

    h, nq, dh = q.shape
    nk = k.shape[1]
    # engage only where the blockwise form wins: at nk < 2048 the dense
    # (H, Nq, Nk) logits fit comfortably and XLA's fused softmax is faster
    # (measured: 15 ms vs 6.7 ms for 9-layer LightGlue at N=1024 under
    # vmap); at 4096 the kernel is 1.2x faster and avoids the 268 MB
    # logits round-trip entirely.
    if pl is None or nq % blk_q or nk % blk_k or dh % 64 or nk < 2048:
        return mha(q, k, v, mask_k=mask_k)

    maskf = jnp.broadcast_to(
        mask_k.astype(jnp.float32)[None, None], (h, 1, nk)
    )
    return _flash_pallas(blk_q, blk_k, q, k, v, maskf)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _flash_pallas(blk_q, blk_k, q, k, v, maskf):
    h, nq, dh = q.shape
    nk = k.shape[1]
    grid = (h, nq // blk_q)
    kernel = functools.partial(
        _flash_attn_kernel, blk_k=blk_k, n_k=nk // blk_k,
        scale=1.0 / (dh ** 0.5)
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, blk_q, dh), lambda hh, i: (hh, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nk, dh), lambda hh, i: (hh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nk, dh), lambda hh, i: (hh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, nk), lambda hh, i: (hh, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, blk_q, dh), lambda hh, i: (hh, i, 0),
                               memory_space=pltpu.VMEM),
    )(q, k, v, maskf)


def _flash_fwd(blk_q, blk_k, q, k, v, maskf):
    return _flash_pallas(blk_q, blk_k, q, k, v, maskf), (q, k, v, maskf)


def _flash_bwd(blk_q, blk_k, res, g):
    q, k, v, maskf = res
    _, vjp = jax.vjp(_fused_attn_xla, q, k, v, maskf)
    return vjp(g)


_flash_pallas.defvjp(_flash_fwd, _flash_bwd)


try:  # Pallas is TPU-only at import time on some hosts; degrade gracefully
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
except Exception:  # pragma: no cover
    pl = None
    pltpu = None


# ---------------------------------------------------------------------------
# Autodiff for the Pallas kernels.
#
# pallas_call has no automatic VJP, so each fused kernel is wrapped in
# jax.custom_vjp: the FORWARD runs the VMEM-resident Pallas program, the
# BACKWARD re-derives gradients through a mathematically identical XLA
# restatement (float masks, same NEG_INF masking and max-subtracted
# softmax). This is the standard flash-attention recipe — recompute the
# logits on the backward pass instead of saving them — and it is what
# lets the TRAINING subsystem (train/step.py) differentiate straight
# through the serving attention path on the chip rather than keeping a
# separate slow path for training.
# ---------------------------------------------------------------------------


def _fused_attn_xla(q, k, v, maskf):
    """Differentiable XLA restatement of _fused_attn_kernel.
    maskf: (H, 1, Nk) float {0,1}."""
    dh = q.shape[-1]
    s = jnp.einsum("hnd,hmd->hnm", q, k,
                   preferred_element_type=jnp.float32) / (dh ** 0.5)
    s = jnp.where(maskf > 0, s, NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("hnm,hmd->hnd", p.astype(q.dtype), v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


# ---------------------------------------------------------------------------
# Single-shot fused attention for matcher-sized token counts (N ≤ 2048).
#
# At LightGlue's serving shape (N=1024, 4 heads, B=4 pairs) the XLA path
# materialises every (N, N) f32 logits tensor to HBM: logits + probs
# round-trips cost ~1 GB/layer ≈ 0.7 ms — the whole per-layer budget.
# These kernels keep the logits in VMEM (4 MB at N=1024): one MXU pass
# for QKᵀ, in-place masked softmax, one MXU pass for the readout. No
# online-softmax machinery — at these sizes the whole K/V fits, which is
# exactly the regime where the blockwise flash kernel was measured
# slower (see flash_attention's gate).
# ---------------------------------------------------------------------------


def _fused_attn_kernel(q_ref, k_ref, v_ref, maskk_ref, o_ref, *, scale):
    q = q_ref[0]
    s = jax.lax.dot_general(
        q, k_ref[0],
        dimension_numbers=(((1,), (1,)), ((), ())),  # (Nq,dh)·(Nk,dh)ᵀ
        preferred_element_type=jnp.float32,
    ) * scale
    s = jnp.where(maskk_ref[0] > 0, s, NEG_INF)
    s = s - jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    o_ref[0] = jax.lax.dot_general(
        p.astype(q.dtype), v_ref[0],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(o_ref.dtype)


@jax.custom_vjp
def _fused_attn_pallas(q, k, v, maskf):
    h, nq, dh = q.shape
    nk = k.shape[1]
    kernel = functools.partial(_fused_attn_kernel, scale=1.0 / dh ** 0.5)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        grid=(h,),
        in_specs=[
            pl.BlockSpec((1, nq, dh), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nk, dh), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nk, dh), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, nk), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, nq, dh), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )(q, k, v, maskf)


def _fused_attn_fwd(q, k, v, maskf):
    return _fused_attn_pallas(q, k, v, maskf), (q, k, v, maskf)


def _fused_attn_bwd(res, g):
    q, k, v, maskf = res
    _, vjp = jax.vjp(_fused_attn_xla, q, k, v, maskf)
    return vjp(g)


_fused_attn_pallas.defvjp(_fused_attn_fwd, _fused_attn_bwd)


def fused_attention_small(q, k, v, mask_k=None):
    """VMEM-resident attention for nk ≤ 2048. q: (H, Nq, Dh), k/v:
    (H, Nk, Dh), mask_k: (Nk,) bool. Falls back to mha off-TPU or at
    unsupported shapes. Differentiable (custom VJP recomputes through
    the XLA restatement)."""
    h, nq, dh = q.shape
    nk = k.shape[1]
    if (pl is None or FORCE_XLA or jax.default_backend() != "tpu"
            or nk > 2048 or nq % 128 or nk % 128 or dh % 64):
        return mha(q, k, v, mask_k=mask_k)
    if mask_k is None:
        maskf = jnp.ones((h, 1, nk), jnp.float32)
    else:
        maskf = jnp.broadcast_to(
            mask_k.astype(jnp.float32)[None, None], (h, 1, nk))
    return _fused_attn_pallas(q, k, v, maskf)


def mha_auto(q, k, v):
    """Unmasked MHA for ViT-class blocks: routes to the VMEM-resident
    fused kernel when the shape lattice allows, padding the token axes
    up to the 128 lattice with a key mask (a DINOv2 560²/14 grid is
    1601 tokens with the cls token → padded to 1664, +4% work for an
    HBM-logits-free pass). Falls back to the XLA einsum path off-TPU or
    when K/V exceed the single-shot VMEM budget."""
    h, nq, dh = q.shape
    nk = k.shape[1]
    nq_p = -(-nq // 128) * 128
    nk_p = -(-nk // 128) * 128
    if (pl is None or jax.default_backend() != "tpu" or dh % 64
            or nk_p > 2048):
        return mha(q, k, v)
    qp = jnp.pad(q, ((0, 0), (0, nq_p - nq), (0, 0)))
    kp = jnp.pad(k, ((0, 0), (0, nk_p - nk), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, nk_p - nk), (0, 0)))
    mask = jnp.arange(nk_p) < nk if nk_p != nk else None
    out = fused_attention_small(qp, kp, vp, mask_k=mask)
    return out[:, :nq] if nq_p != nq else out


def _bidir_attn_kernel(a0_ref, a1_ref, v0_ref, v1_ref, m0_ref, m1_ref,
                       o0_ref, o1_ref, *, scale):
    a0 = a0_ref[0]
    sim = jax.lax.dot_general(
        a0, a1_ref[0],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale                                            # (N, M) f32
    l01 = jnp.where(m1_ref[0] > 0, sim, NEG_INF)        # mask cols
    l01 = l01 - jnp.max(l01, axis=1, keepdims=True)
    p01 = jnp.exp(l01)
    p01 = p01 / jnp.sum(p01, axis=1, keepdims=True)
    o0_ref[0] = jax.lax.dot_general(
        p01.astype(a0.dtype), v1_ref[0],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(o0_ref.dtype)
    l10 = jnp.where(m0_ref[0] > 0, sim, NEG_INF)        # mask rows (n,1)
    l10 = l10 - jnp.max(l10, axis=0, keepdims=True)
    p10 = jnp.exp(l10)
    p10 = p10 / jnp.sum(p10, axis=0, keepdims=True)
    o1_ref[0] = jax.lax.dot_general(
        p10.astype(a0.dtype), v0_ref[0],
        dimension_numbers=(((0,), (0,)), ((), ())),      # Σ_n p10·v0
        preferred_element_type=jnp.float32,
    ).astype(o1_ref.dtype)


def _bidir_xla(a0, a1, v0, v1, mk0, mk1):
    """Differentiable XLA restatement of _bidir_attn_kernel.
    mk0: (H, N, 1), mk1: (H, 1, M) float {0,1}."""
    dh = a0.shape[-1]
    logits = jnp.einsum("hnd,hmd->hnm", a0, a1,
                        preferred_element_type=jnp.float32) / (dh ** 0.5)
    l01 = jnp.where(mk1 > 0, logits, NEG_INF)
    l10 = jnp.where(mk0 > 0, logits, NEG_INF)
    att01 = jax.nn.softmax(l01, axis=-1)
    att10 = jax.nn.softmax(l10, axis=-2)
    m0 = jnp.einsum("hnm,hmd->hnd", att01.astype(a0.dtype), v1,
                    preferred_element_type=jnp.float32).astype(a0.dtype)
    m1 = jnp.einsum("hnm,hnd->hmd", att10.astype(a1.dtype), v0,
                    preferred_element_type=jnp.float32).astype(a1.dtype)
    return m0, m1


@jax.custom_vjp
def _bidir_pallas(a0, a1, v0, v1, mk0, mk1):
    h, n, dh = a0.shape
    m = a1.shape[1]
    kernel = functools.partial(_bidir_attn_kernel, scale=1.0 / dh ** 0.5)
    return pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((h, n, dh), a0.dtype),
                   jax.ShapeDtypeStruct((h, m, dh), a1.dtype)),
        grid=(h,),
        in_specs=[
            pl.BlockSpec((1, n, dh), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, dh), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, dh), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, dh), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, m), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, n, dh), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, dh), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
    )(a0, a1, v0, v1, mk0, mk1)


def _bidir_fwd(a0, a1, v0, v1, mk0, mk1):
    return _bidir_pallas(a0, a1, v0, v1, mk0, mk1), (a0, a1, v0, v1, mk0, mk1)


def _bidir_bwd(res, g):
    _, vjp = jax.vjp(_bidir_xla, *res)
    return vjp(g)


_bidir_pallas.defvjp(_bidir_fwd, _bidir_bwd)


def bidirectional_attention(a0, a1, v0, v1, mask0=None, mask1=None):
    """LightGlue cross-attention: ONE QKᵀ, softmaxed along both axes,
    two readouts — all VMEM-resident. a0: (H, N, Dh), a1: (H, M, Dh),
    v0/v1 likewise. Returns (m0 (H, N, Dh), m1 (H, M, Dh)).
    Falls back to the two-softmax XLA path off-TPU. Differentiable
    (custom VJP recomputes through the XLA restatement)."""
    h, n, dh = a0.shape
    m = a1.shape[1]
    ok = (pl is not None and not FORCE_XLA
          and jax.default_backend() == "tpu"
          and max(n, m) <= 2048 and n % 128 == 0 and m % 128 == 0
          and dh % 64 == 0)
    mk0 = (jnp.ones((n,)) if mask0 is None else mask0).astype(jnp.float32)
    mk1 = (jnp.ones((m,)) if mask1 is None else mask1).astype(jnp.float32)
    mk0 = jnp.broadcast_to(mk0[None, :, None], (h, n, 1))
    mk1 = jnp.broadcast_to(mk1[None, None, :], (h, 1, m))
    if not ok:
        return _bidir_xla(a0, a1, v0, v1, mk0, mk1)
    return _bidir_pallas(a0, a1, v0, v1, mk0, mk1)
