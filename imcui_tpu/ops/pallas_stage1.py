"""Fused Pallas kernel for a width-folded VGG stage tail:
bias+ReLU (previous conv's epilogue) → 3×3 folded conv → bias+ReLU →
2×2 max-pool, all VMEM-resident.

Why (measured, tools/profile_trunk.py on v5e at 8×1024²): after the
width-folding rewrite (layers.fold_conv3x3) the XLA stage-1 still spends
~13.4 ms — conv1a's unfused bias/relu epilogue re-reads+rewrites the
1 GB activation (~2.4 ms), conv1b runs 9 taps at MXU peak (5.7 ms), and
the pool is a separate 3.8 ms pass. This kernel reads the *raw* conv1a
output once and writes only the pooled half-res output: measured 8.0 ms
for the whole tail, 13.4 → 9.6 ms for stage 1 including the XLA conv1a.

Performance notes baked into the structure (each probed on hardware):
- cross-program DOUBLE-BUFFERED halo DMA: serial per-program
  start/wait cost 16 ms alone (latency-bound); prefetching program
  f+1's rows while computing f hides it entirely;
- accumulation as a VALUE chain per w2-chunk, not ref accumulation:
  `acc[:] = acc[:] + dot` costs ~1.1 ms/pass in VMEM round-trips
  (9 passes ≈ the whole MXU budget again); chunked value sums let
  Mosaic keep partials on-stack (WC=512 best; interleave the adds or
  the stack OOMs);
- neighbour taps via sublane slicing+concat: lane-dim concat is a
  relayout (25 ms), bf16 sublane rotate is unsupported — slices of the
  (rows, w2, 128) tile along w2 are free;
- the pool's horizontal max uses a 64-lane roll (f32-only, which the
  accumulator is) + iota select; its refold is a free lane re-chunk.

Layout contract: width-folded everywhere — activations (B, H, W₂, 128)
with channels exactly 128 lanes, so no tile padding in HBM or VMEM.
Folded conv decomposes per vertical tap dy into center/left/right
(128,128) matmuls (9 MXU passes; the fold's 2× FLOP overhead is the
price of 100% MXU width on C=64 layers — measured net 2.4× faster).
"""

import functools

import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
except Exception:  # pragma: no cover
    pl = None
    pltpu = None

T = 16    # conv rows per program (T/2 = 8 pooled rows keeps stores aligned)
WC = 512  # w2 chunk per value-accumulated matmul group
WC_STEM = 256  # stem kernel's conv1b chunk: the image double-buffer
               # takes the VMEM the 512-chunk value chain needs


def _kernel(y1_hbm, ba_ref, kc_ref, kl_ref, kr_ref, bb_ref, o_ref, *,
            h_rows, w2, n_b, pipelined=True):
    b = pl.program_id(0)
    j = pl.program_id(1)
    n_j = pl.num_programs(1)
    flat = b * n_j + j
    total = n_b * n_j

    def body(xs2, acc, sem2):
        # ---- double-buffered halo DMA (rows jj*T-1 .. jj*T+T) ----
        def dmas(f):
            bb = f // n_j
            jj = f % n_j
            slot = jax.lax.rem(f, 2)
            return (
                (jnp.logical_and(jj > 0, jj < n_j - 1),
                 lambda: pltpu.make_async_copy(
                     y1_hbm.at[bb, pl.ds(jj * T - 1, T + 2)],
                     xs2.at[slot], sem2.at[slot])),
                (jj == 0,
                 lambda: pltpu.make_async_copy(
                     y1_hbm.at[bb, pl.ds(0, T + 1)],
                     xs2.at[slot, pl.ds(1, T + 1)], sem2.at[slot])),
                (jnp.logical_and(jj == n_j - 1, n_j > 1),
                 lambda: pltpu.make_async_copy(
                     y1_hbm.at[bb, pl.ds(h_rows - (T + 1), T + 1)],
                     xs2.at[slot, pl.ds(0, T + 1)], sem2.at[slot])),
            )

        def start_dma(f):
            for cond, mk in dmas(f):
                pl.when(cond)(lambda mk=mk: mk().start())

        def wait_dma(f):
            for cond, mk in dmas(f):
                pl.when(cond)(lambda mk=mk: mk().wait())

        if pipelined:
            # cross-program prefetch: program f starts f+1's copy (scratch
            # persists across the sequential TPU grid)
            @pl.when(flat == 0)
            def _():
                start_dma(flat)

            @pl.when(flat + 1 < total)
            def _():
                start_dma(flat + 1)
        else:
            # interpret mode: scratch does not persist across programs
            start_dma(flat)

        wait_dma(flat)
        xs = xs2.at[jax.lax.rem(flat, 2)]

        # ---- previous conv's epilogue: bias + relu, in place ----
        xs[:] = jnp.maximum(xs[:] + ba_ref[0].astype(jnp.bfloat16), 0)

        # halo rows must be ZERO as conv input (SAME padding semantics);
        # zero AFTER the prologue — relu(0 + bias) ≠ 0
        @pl.when(j == 0)
        def _():
            xs[0] = jnp.zeros((w2, 128), jnp.bfloat16)

        @pl.when(j == n_j - 1)
        def _():
            xs[T + 1] = jnp.zeros((w2, 128), jnp.bfloat16)

        # ---- folded 3×3 conv: value-accumulated matmul chain ----
        zcol = jnp.zeros((T, 1, 128), jnp.bfloat16)
        for wc in range(0, w2, WC):
            wce = min(wc + WC, w2)
            s = None
            for dy in range(3):
                rows = xs[dy:dy + T, wc:wce]
                if wc == 0:
                    left = jnp.concatenate([zcol, xs[dy:dy + T, 0:wce - 1]],
                                           1)
                else:
                    left = xs[dy:dy + T, wc - 1:wce - 1]
                if wce == w2:
                    right = jnp.concatenate(
                        [xs[dy:dy + T, wc + 1:wce], zcol], 1)
                else:
                    right = xs[dy:dy + T, wc + 1:wce + 1]
                for tap, kref in ((rows, kc_ref), (left, kl_ref),
                                  (right, kr_ref)):
                    p = jax.lax.dot_general(
                        tap, kref[dy],
                        dimension_numbers=(((2,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    s = p if s is None else s + p
            acc[:, wc:wce] = s

        # ---- bias + relu + 2×2 pool (stays folded) ----
        z = jnp.maximum(acc[:] + bb_ref[0], 0.0)
        v = jnp.max(z.reshape(T // 2, 2, w2, 128), 1)      # vertical pairs
        hm = jnp.maximum(v, pltpu.roll(v, 64, 2))          # horiz (lane) max
        vv = hm.reshape(T // 2, w2 // 2, 2, 128)
        lane = jax.lax.broadcasted_iota(jnp.int32, (T // 2, w2 // 2, 128), 2)
        o_ref[0] = jnp.where(lane < 64, vv[:, :, 0],
                             vv[:, :, 1]).astype(o_ref.dtype)

    pl.run_scoped(
        body,
        pltpu.VMEM((2, T + 2, w2, 128), jnp.bfloat16),
        pltpu.VMEM((T, w2, 128), jnp.float32),
        pltpu.SemaphoreType.DMA((2,)),
    )


def stage_tail(y_raw, ba_f, w_folded, bb_f, *, interpret=False):
    """y_raw: (B, H, W₂, 128) bf16 — previous conv's output, folded,
    WITHOUT its bias/relu. ba_f/bb_f: (128,) folded biases (previous
    conv's and this conv's); w_folded: (3, 3, 128, 128) from
    layers.fold_conv3x3. Returns pooled (B, H/2, W₂/2, 128) bf16."""
    b, h, w2, c = y_raw.shape
    kernel = functools.partial(_kernel, h_rows=h, w2=w2, n_b=b,
                               pipelined=not interpret)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, h // 2, w2 // 2, 128),
                                       jnp.bfloat16),
        grid=(b, h // T),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] +
                 [pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
        out_specs=pl.BlockSpec((1, T // 2, w2 // 2, 128),
                               lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * w2 * 9 * 128 * 128,
            bytes_accessed=b * h * w2 * 128 * 2 * 3 // 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(
        y_raw,
        ba_f.reshape(1, 128).astype(jnp.float32),
        w_folded[:, 1].astype(jnp.bfloat16),
        w_folded[:, 0].astype(jnp.bfloat16),
        w_folded[:, 2].astype(jnp.bfloat16),
        bb_f.reshape(1, 128).astype(jnp.float32),
    )


def supported(h, w2):
    """Shape gate for the fused path (see backbone fallback chain)."""
    return (
        pl is not None
        and jax.default_backend() == "tpu"
        and h % T == 0
        and h // T >= 2
        and w2 % 8 == 0
        and w2 >= 16
    )


# ---------------------------------------------------------------------------
# Fused STEM: conv1a computed in-kernel from the folded image.
#
# *** REJECTED optimisation — kept as a documented negative result. ***
# Hypothesis (tools/profile_stage1.py at 8×1024²): XLA's folded conv1a
# (contraction depth 3·3·2=18 against 128 MXU lanes) costs ~6.9 ms in
# situ for 19 GFLOP while the conv1b tail runs at 154 TF/s (78% of v5e
# peak), so computing the stencil on the VPU inside the kernel should
# overlap it away. Measured: trunk 21.4 → 43.3 ms with 1-lane-slice
# broadcasts (Mosaic lowers them to shuffle trees), still 30.7 ms after
# reformulating to pure full-lane FMAs on a lane-broadcast image. The
# stencil is broadcast/bandwidth-bound, not FLOP-bound: 12 taps ×
# (T+2, w2, 128) f32 values ≈ 130 MB of VMEM traffic per program plus a
# 64×-redundant 1.35 GB padded image DMA — more than XLA's conv costs.
# superpoint.backbone therefore keeps the XLA conv1a + stage_tail path.
#
# Folded-tap bookkeeping: the folded image (rows, w2, 2) has channels
# [even pixel 2w2, odd pixel 2w2+1] (layers.fold_width). Every folded
# conv1a output needs four input slices: even@w2, odd@w2, odd@w2−1,
# even@w2+1. Their 128-lane weight vectors are exactly four slices of
# fold_conv3x3's folded kernel (the remaining two (dx2, q) combos are
# structural zeros — see stem_tail).
# ---------------------------------------------------------------------------

RC = 3  # conv1a row-chunk ((T+2) must divide evenly; RC=6 left the scoped
        # VMEM 804 KB over the 16 MB limit)


def _stem_kernel(img_hbm, kv_ref, ba_ref, kc_ref, kl_ref, kr_ref, bb_ref,
                 o_ref, *, h_rows, w2, n_b, pipelined=True):
    b = pl.program_id(0)
    j = pl.program_id(1)
    n_j = pl.num_programs(1)
    flat = b * n_j + j
    total = n_b * n_j

    def body(imgb2, xs, sem2):
        # ---- double-buffered image DMA (rows jj*T-2 .. jj*T+T+1) ----
        # single-buffered DMA (40 KB logical/2.6 MB padded per program —
        # the double buffer cost 2.6 MB of scoped VMEM the conv1b value
        # chain needs; the serial copy is ~3 us against ~15 us compute)
        def dmas(f):
            bb2 = f // n_j
            jj = f % n_j
            return (
                (jnp.logical_and(jj > 0, jj < n_j - 1),
                 lambda: pltpu.make_async_copy(
                     img_hbm.at[bb2, pl.ds(jj * T - 2, T + 4)],
                     imgb2, sem2)),
                (jj == 0,
                 lambda: pltpu.make_async_copy(
                     img_hbm.at[bb2, pl.ds(0, T + 2)],
                     imgb2.at[pl.ds(2, T + 2)], sem2)),
                (jnp.logical_and(jj == n_j - 1, n_j > 1),
                 lambda: pltpu.make_async_copy(
                     img_hbm.at[bb2, pl.ds(h_rows - (T + 2), T + 2)],
                     imgb2.at[pl.ds(0, T + 2)], sem2)),
            )

        for cond, mk in dmas(flat):
            pl.when(cond)(lambda mk=mk: mk().start())
        for cond, mk in dmas(flat):
            pl.when(cond)(lambda mk=mk: mk().wait())

        imgb = imgb2

        # image rows beyond the vertical border are zero (SAME padding);
        # the buffer slots are reused across programs, so zero every time
        @pl.when(j == 0)
        def _():
            imgb[0:2] = jnp.zeros((2, w2, 128), jnp.bfloat16)

        @pl.when(j == n_j - 1)
        def _():
            imgb[T + 2:T + 4] = jnp.zeros((2, w2, 128), jnp.bfloat16)

        # ---- conv1a: full-lane FMAs per row-chunk, VPU-only ----
        # The image arrives lane-BROADCAST ([q0×64 | q1×64], see
        # stem_tail): every term is a native 128-lane multiply — the
        # earlier 1-lane-slice + lane-broadcast formulation lowered to
        # shuffle trees (trunk 43 ms vs 21 baseline). Cross-parity terms
        # use a 64-lane f32 roll; w2∓1 terms are free sublane concats.
        # xs row i ↦ conv output row j·T−1+i ↦ image rows i..i+2 of imgb.
        # fori_loop (not an unrolled range) — the Mosaic scheduler keeps
        # every unrolled chunk's value chain live at once (measured
        # 33.9 MB stack vs the 16 MB scoped limit).
        def conv1a_chunk(ci, carry):
            rc = ci * RC
            a = None
            zrow = jnp.zeros((RC, 1, 128), jnp.float32)
            for dy in range(3):
                bf = imgb[pl.ds(rc + dy, RC)].astype(jnp.float32)
                sw = pltpu.roll(bf, 64, 2)                  # [q1 | q0]
                shm = jnp.concatenate([zrow, sw[:, :-1]], 1)   # w2-1
                shp = jnp.concatenate([sw[:, 1:], zrow], 1)    # w2+1
                for s, sl in enumerate((bf, sw, shm, shp)):
                    p = sl * kv_ref[dy, s][None, None, :]
                    a = p if a is None else a + p
            xs[pl.ds(rc, RC)] = jnp.maximum(
                a + ba_ref[0][None, None, :], 0).astype(jnp.bfloat16)
            return carry

        assert (T + 2) % RC == 0
        jax.lax.fori_loop(0, (T + 2) // RC, conv1a_chunk, 0)

        # conv1b's vertical halo rows must be ZERO at the image border
        @pl.when(j == 0)
        def _():
            xs[0] = jnp.zeros((w2, 128), jnp.bfloat16)

        @pl.when(j == n_j - 1)
        def _():
            xs[T + 1] = jnp.zeros((w2, 128), jnp.bfloat16)

        # ---- folded 3×3 conv1b + bias/relu/pool per w2-chunk ----
        # (no (T, w2, 128) f32 accumulator buffer: pooling within the
        # chunk and writing the output slab directly keeps scoped VMEM
        # at ~12.6 MB — the accumulator variant OOMed at 16.79)
        zcol = jnp.zeros((T, 1, 128), jnp.bfloat16)
        for wc in range(0, w2, WC_STEM):
            wce = min(wc + WC_STEM, w2)
            s = None
            for dy in range(3):
                rows = xs[dy:dy + T, wc:wce]
                if wc == 0:
                    left = jnp.concatenate([zcol, xs[dy:dy + T, 0:wce - 1]],
                                           1)
                else:
                    left = xs[dy:dy + T, wc - 1:wce - 1]
                if wce == w2:
                    right = jnp.concatenate(
                        [xs[dy:dy + T, wc + 1:wce], zcol], 1)
                else:
                    right = xs[dy:dy + T, wc + 1:wce + 1]
                for tap, kref in ((rows, kc_ref), (left, kl_ref),
                                  (right, kr_ref)):
                    p = jax.lax.dot_general(
                        tap, kref[dy],
                        dimension_numbers=(((2,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    s = p if s is None else s + p
            nw = wce - wc
            z = jnp.maximum(s + bb_ref[0], 0.0)
            v = jnp.max(z.reshape(T // 2, 2, nw, 128), 1)
            hm = jnp.maximum(v, pltpu.roll(v, 64, 2))
            vv = hm.reshape(T // 2, nw // 2, 2, 128)
            lane = jax.lax.broadcasted_iota(
                jnp.int32, (T // 2, nw // 2, 128), 2)
            o_ref[0, :, wc // 2:wce // 2] = jnp.where(
                lane < 64, vv[:, :, 0], vv[:, :, 1]).astype(o_ref.dtype)

    pl.run_scoped(
        body,
        pltpu.VMEM((T + 4, w2, 128), jnp.bfloat16),
        pltpu.VMEM((T + 2, w2, 128), jnp.bfloat16),
        pltpu.SemaphoreType.DMA(()),
    )


def stem_tail(img_f, wa_folded, ba_f, wb_folded, bb_f, *, interpret=False):
    """Fused SuperPoint stem: folded image in, pooled stage-1 output out.

    img_f: (B, H, W₂, 2) bf16 — layers.fold_width(image); wa_folded/ba_f:
    (3, 3, 2, 128)/(128,) from layers.fold_conv3x3(conv1a); wb_folded/
    bb_f likewise for conv1b. Returns (B, H/2, W₂/2, 128) bf16 ==
    max_pool_folded(relu(conv1b(relu(conv1a(img))))).
    """
    b, h, w2, _ = img_f.shape
    # Mosaic cannot vector.load from a 2-lane-minor VMEM buffer (lane
    # tile is 128), so the image rides lane-BROADCAST: lanes 0-63 carry
    # the even pixel, 64-127 the odd. The write costs ~0.5 ms of HBM at
    # 8×1024² (same as zero-padding would) and buys the kernel pure
    # full-lane multiplies instead of 1-lane broadcasts.
    img_f = jnp.concatenate([
        jnp.broadcast_to(img_f[..., 0:1], img_f.shape[:-1] + (64,)),
        jnp.broadcast_to(img_f[..., 1:2], img_f.shape[:-1] + (64,)),
    ], -1)
    # Weight vectors per (dy, operand): each operand is a 128-lane image
    # view ([q0|q1], its 64-roll [q1|q0], and their w2∓1 shifts); the
    # lane-vector pairs route each parity to the right folded output
    # half. The (dx2=left, q=even) / (dx2=right, q=odd) combos are
    # structural zeros of fold_conv3x3's kernel, which is why four
    # operands cover all nine taps of both parities.
    half = 64
    z = jnp.zeros((3, half), wa_folded.dtype)
    kv = jnp.stack([
        # [q0|q1]: even@w2 → p0 center; odd@w2 → p1 center
        jnp.concatenate([wa_folded[:, 1, 0, :half],
                         wa_folded[:, 1, 1, half:]], -1),
        # [q1|q0]: odd@w2 → p0 right; even@w2 → p1 left
        jnp.concatenate([wa_folded[:, 1, 1, :half],
                         wa_folded[:, 1, 0, half:]], -1),
        # shift(w2-1) of [q1|q0]: odd@w2-1 → p0 left
        jnp.concatenate([wa_folded[:, 0, 1, :half], z], -1),
        # shift(w2+1) of [q1|q0]: even@w2+1 → p1 right
        jnp.concatenate([z, wa_folded[:, 2, 0, half:]], -1),
    ], axis=1).astype(jnp.float32)                     # (3, 4, 128)
    kernel = functools.partial(_stem_kernel, h_rows=h, w2=w2, n_b=b,
                               pipelined=not interpret)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, h // 2, w2 // 2, 128),
                                       jnp.bfloat16),
        grid=(b, h // T),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] +
                 [pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
        out_specs=pl.BlockSpec((1, T // 2, w2 // 2, 128),
                               lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * w2 * 9 * 128 * 128,
            bytes_accessed=b * h * w2 * (128 * 2 + 128) // 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(
        img_f,
        kv,
        ba_f.reshape(1, 128).astype(jnp.float32),
        wb_folded[:, 1].astype(jnp.bfloat16),
        wb_folded[:, 0].astype(jnp.bfloat16),
        wb_folded[:, 2].astype(jnp.bfloat16),
        bb_f.reshape(1, 128).astype(jnp.float32),
    )
