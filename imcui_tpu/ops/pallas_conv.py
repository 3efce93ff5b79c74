"""EXPERIMENTAL fused Pallas kernel for SuperPoint's stem:
conv3×3(1→64) → ReLU → conv3×3(64→64) → ReLU → maxpool2×2 in one
VMEM-resident pass.

STATUS — not wired into the production path. Measured on v5e at 8×1024²:
46 ms vs 22 ms for the XLA stem. The hypothesis (avoid two HBM round
trips of lane-padded 64-channel activations) was sound, but per-program
lane rotations + tap stacking on the VPU dominate at the small row tiles
that VMEM permits, and a numerics deviation (~0.3 absolute) remains under
investigation. Kept for its documentation value: the Mosaic constraints
below were probed empirically and shape any future kernel work here.
A space-to-depth XLA reformulation was also evaluated and rejected: the
exact s2d equivalent of a 3×3 conv needs a 3×3 block kernel (4× FLOPs),
which cancels the layout win. A grouped-conv pair-packing variant (stack
two images channel-wise to C=128, ``feature_group_count=2`` with tiled
weights — numerically exact) was also measured and rejected: 15.8 ms for
C=128/B=4/groups=2 vs 8.6 ms for plain C=64/B=8 at 1024² on v5e — XLA
lowers grouped convs group-serially, losing more than the lane padding
costs. NCHW dimension numbers were measured too: 13.9 vs 8.7 ms per conv
(26.6 vs 17.2 ms for a conv-relu-conv chain) — XLA transposes back to
its native layout, so the NHWC path stays canonical.

Why: this block dominates the extractor's runtime. At 1024² the
64-channel full-resolution activations are written to and re-read from HBM
twice by the XLA path — and the C=64 minor dim pads to 128 lanes, doubling
the traffic (measured ~17 ms for 8 images on v5e; the convs are only
~0.6 TFLOP ≈ 1.6 ms of MXU time). The fused kernel DMA-streams overlapping
row tiles of the 1-channel input from HBM and writes only the pooled
half-resolution output; the fat intermediates never leave VMEM.

Mosaic constraints that shaped the implementation (probed empirically):
- lane-dim (minor) slice offsets are unsupported → horizontal conv taps
  come from `pltpu.roll` lane rotations (32-bit only) + offset-0 slices;
- every vector shape must be (8, 128)-tile aligned; DMA row slices must be
  8-aligned;
- `lax.dynamic_slice` on values is not lowered → tap loops are static
  Python loops, and big intermediates round-trip through VMEM scratch
  *refs* so the stack planner can reuse the space between taps.

Per (image, row-tile) program:
  1. async-copy an aligned halo row tile of the padded input into VMEM,
  2. conv1a as 3 row-tap (rows·width, 4) @ (4, 64) im2col matmuls,
  3. conv1b as 9 (T2·w, 64) @ (64, 64) MXU matmuls accumulated in a
     scratch ref, reading sublane-shifted views of the conv1a scratch,
  4. 2×2 max-pool via aligned reshape-splits, one (T, W/2, 64) store.
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

TILE_R = 4        # pooled output rows per program (T2=8 keeps DMA
T2 = 2 * TILE_R   # row offsets 8-aligned — a hard Mosaic requirement)
ROWS = 16         # aligned conv1a compute rows (needs T2+2 = 10)
LANES = 128


def _stem_kernel(x_hbm, w1a_ref, b1a_ref, w1b_ref, b1b_ref, o_ref, *,
                 w, wpad):
    img = pl.program_id(0)
    jrow = pl.program_id(1)
    w1 = w + LANES  # conv1a output width (aligned, ≥ w+2)

    def body(xs, y1_ref, acc_ref, sem):
        copy = pltpu.make_async_copy(
            x_hbm.at[img, pl.ds(jrow * T2, ROWS + 8), :],
            xs.at[pl.ds(0, ROWS + 8), :],
            sem,
        )
        copy.start()
        copy.wait()

        x = xs[:]  # (ROWS+8, wpad) f32 — lane rotate requires 32-bit
        rolled = [x, pltpu.roll(x, wpad - 1, 1), pltpu.roll(x, wpad - 2, 1)]
        # conv1a: one (ROWS·w1, 4) @ (4, 64) matmul per row tap, writing
        # the running sum into the y1 scratch so tap temporaries can die.
        # Slices keep aligned shapes (ROWS, w1); offsets dy are free.
        for dy in range(3):
            taps = [r[dy:dy + ROWS, :w1] for r in rolled]
            p = jnp.stack(
                taps + [jnp.zeros((ROWS, w1), jnp.float32)], -1
            ).astype(jnp.bfloat16)
            wk = w1a_ref[dy * 4:dy * 4 + 4].astype(jnp.bfloat16)
            contrib = jax.lax.dot_general(
                p.reshape(-1, 4), wk,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,  # matmul acc is 32-bit
            ).reshape(ROWS, w1, 64).astype(jnp.bfloat16)
            if dy == 0:
                y1_ref[:] = contrib
            else:
                y1_ref[:] = y1_ref[:] + contrib

        # bias + relu, in place
        y1_ref[:] = jnp.maximum(
            y1_ref[:] + b1a_ref[0].astype(jnp.bfloat16), 0)

        # conv1b: 9 accumulated matmuls, slices read from the scratch ref
        for dy in range(3):
            for dx in range(3):
                sl = y1_ref[dy:dy + T2, dx:dx + w, :].reshape(-1, 64)
                contrib = jax.lax.dot_general(
                    sl, w1b_ref[dy * 3 + dx].astype(jnp.bfloat16),
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                if dy == 0 and dx == 0:
                    acc_ref[:] = contrib
                else:
                    acc_ref[:] = acc_ref[:] + contrib

        y2 = jnp.maximum(acc_ref[:].reshape(T2, w, 64) + b1b_ref[0], 0.0)
        y2 = jnp.max(y2.reshape(TILE_R, 2, w, 64), 1)
        o_ref[0] = jnp.max(
            y2.reshape(TILE_R, w // 2, 2, 64), 2
        ).astype(o_ref.dtype)

    pl.run_scoped(
        body,
        pltpu.VMEM((ROWS + 8, wpad), jnp.float32),
        pltpu.VMEM((ROWS, w + LANES, 64), jnp.bfloat16),
        pltpu.VMEM((T2 * w, 64), jnp.float32),
        pltpu.SemaphoreType.DMA(()),
    )


def _round_up(x, m):
    return -(-x // m) * m


@jax.jit
def superpoint_stem_fused(image, w1a, b1a, w1b, b1b):
    """image: (B, H, W) f32 in [0,1]; weights in HWIO layout.

    Returns (B, H/2, W/2, 64) bf16 — ReLU'd, pooled stem output.
    Falls back to the XLA path off-TPU or for non-conforming shapes.
    """
    b, h, w = image.shape
    if (
        pl is None
        or jax.default_backend() != "tpu"
        or h % T2 != 0
        or w % (2 * LANES) != 0
    ):
        return _stem_xla(image, w1a, b1a, w1b, b1b)

    # w1a packed by row-tap groups of 4 (3 real dx taps + 1 zero lane)
    w1a_p = jnp.zeros((16, 64), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            w1a_p = w1a_p.at[dy * 4 + dx].set(
                w1a[dy, dx, 0].astype(jnp.float32))
    w1b_p = w1b.reshape(9, 64, 64).astype(jnp.float32)

    wpad = _round_up(w + 4, LANES) + LANES  # roll headroom + halo
    xpad = jnp.pad(image, ((0, 0), (2, ROWS), (2, wpad - w - 2)))
    grid = (b, h // T2)
    kernel = functools.partial(_stem_kernel, w=w, wpad=wpad)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, h // 2, w // 2, 64),
                                       jnp.bfloat16),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # manual halo DMA
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, TILE_R, w // 2, 64),
            lambda i, j: (i, j, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * w * 64 * (12 + 9 * 64),
            bytes_accessed=b * (h * w * 4 + (h // 2) * (w // 2) * 64 * 2),
            transcendentals=0,
        ),
    )(xpad, w1a_p, b1a.reshape(1, 64).astype(jnp.float32), w1b_p,
      b1b.reshape(1, 64).astype(jnp.float32))
    return out


def _stem_xla(image, w1a, b1a, w1b, b1b):
    """Reference XLA path (used off-TPU and in numerics tests)."""
    from jax import lax

    x = image[..., None].astype(jnp.bfloat16)
    y = lax.conv_general_dilated(
        x, w1a.astype(jnp.bfloat16), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    y = jnp.maximum(y + b1a, 0.0).astype(jnp.bfloat16)
    y = lax.conv_general_dilated(
        y, w1b.astype(jnp.bfloat16), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    y = jnp.maximum(y + b1b, 0.0)
    y = lax.reduce_window(
        y, -jnp.inf, lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    )
    return y.astype(jnp.bfloat16)
