"""Fused Pallas NMS + top-k preparation for full-resolution heatmaps.

Replaces the XLA postproc chain ``simple_nms → border_mask →
approx_max_k over H·W`` (measured 1.8 + 0.7 ms at 8×1024², r2 profile in
BASELINE.md) with ONE pass over the heatmap: each program DMAs a row
block once (double-buffered), runs the full iterative-suppression NMS
chain in VMEM, masks the border/valid region, and reduces every 4×4
cell to (max score, in-cell position). The host-side top-k then runs on
the 16×-smaller cell grid.

Why the cell reduction is exact here: after radius-r NMS with r ≥ 3,
surviving maxima are ≥ r+1 ≥ 4 px apart, so a 4×4 cell holds at most
one survivor (the XLA formulation of the same idea —
ops/nms.py:_select_topk_cellmax — lost its win to the (hc,4,wc,4)
relayout shuffle; in-kernel the shuffle is shifts + one selection
matmul). Exact ties inside one 9×9 window can both survive the equality
NMS and then collide in a cell — the same near-tie class approx_max_k's
0.99 recall already accepts.

Kernel shape notes (all probed patterns from ops/pallas_stage1.py):
- window maxes are separable and hierarchical: shifts 1, 2, 4 then an
  8-shift + recenter — 5 ops per 9-window instead of 8;
- vertical shifts are sublane slice+concat (free); horizontal shifts are
  f32 lane rolls with an iota select for the wrapped lanes;
- out-of-image rows/lanes carry a −1e30 sentinel so window maxes see
  the same −inf padding as ``lax.reduce_window(SAME)``, and every mask
  term guards ``x > SENTINEL`` so sentinel rows never suppress;
- the 1-in-4 lane compaction of the cell results is a (rows, W) @
  (W, W/4) selection matmul on the MXU — strided lane slices relayout;
- halo = (2·iterations+1)·r rows per side covers the suppression
  chain's full receptive field, so the central T rows are bit-exact.
"""

import functools
import os

import jax
import jax.numpy as jnp
from jax import lax

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
except Exception:  # pragma: no cover
    pl = None
    pltpu = None

T = 32          # heat rows per program (divisible by 4)
SENTINEL = -1e30


def _halo(radius, iterations):
    """Receptive-field halo, rounded up to the sublane tile (8): Mosaic
    must prove the HBM DMA row offset divisible by 8, so every row0
    candidate (0, j·T−halo, h−rb) has to be a multiple of 8."""
    need = (2 * iterations + 1) * radius
    return (need + 7) // 8 * 8


def supported(h, w, radius, iterations=2):
    # env gate is read at trace time (jit caches per static shape; flip
    # it only between processes, e.g. for A/B benchmarking)
    if os.environ.get("IMCUI_DISABLE_PALLAS_NMS"):
        return False
    halo = _halo(radius, iterations)
    return (pl is not None and jax.default_backend() == "tpu"
            and h % T == 0 and w % 128 == 0
            and w <= 2048 and halo <= T and radius >= 3
            and h >= T + 2 * halo)


def _shift_rows(x, k, fill):
    """x[i] ← x[i+k] (k may be negative); vacated rows ← fill."""
    pad = jnp.full((abs(k),) + x.shape[1:], fill, x.dtype)
    if k > 0:
        return jnp.concatenate([x[k:], pad], 0)
    if k < 0:
        return jnp.concatenate([pad, x[:k]], 0)
    return x


def _shift_lanes(x, k, fill, lane_iota):
    """x[, l] ← x[, l+k]; vacated lanes ← fill (roll + iota select)."""
    if k == 0:
        return x
    w = x.shape[-1]
    y = pltpu.roll(x, -k % w, 1)
    if k > 0:
        return jnp.where(lane_iota < w - k, y, fill)
    return jnp.where(lane_iota >= -k, y, fill)


def _win_max_simple(x, r, lane_iota):
    """Separable (2r+1) window max with sentinel (−inf-like) padding.

    Two one-sided doubling chains (forward: max x[i..i+r], backward:
    max x[i−r..i]) combined — unlike left-align-then-recenter, the
    sentinel fills then reproduce reduce_window(SAME)'s PARTIAL windows
    at both edges exactly."""
    for axis in (1, 0):
        if axis == 1:
            sh = functools.partial(_shift_lanes, fill=SENTINEL,
                                   lane_iota=lane_iota)
        else:
            sh = functools.partial(_shift_rows, fill=SENTINEL)

        def side(v, sign):
            acc = v
            covered = 1                 # max over [i, i+sign*(covered-1)]
            while covered < r + 1:
                step = min(covered, r + 1 - covered)
                acc = jnp.maximum(acc, sh(acc, sign * step))
                covered += step
            return acc

        x = jnp.maximum(side(x, 1), side(x, -1))
    return x


def _kernel(vwh_ref, heat_hbm, cmax_ref, csub_ref, xs2, sem2, *,
            h, w, n_b, radius, iterations, border, halo, pipelined):
    b = pl.program_id(0)
    j = pl.program_id(1)
    n_j = pl.num_programs(1)
    flat = b * n_j + j
    total = n_b * n_j
    rb = T + 2 * halo

    # Edge programs: rather than partial copies, we copy a full rb-row
    # window CLAMPED in-range (top: rows [0, rb); bottom: [h-rb, h)) and
    # remap local row indices — every DMA stays full-size/static-shape.
    def row0_of(jj):
        # exact in units of 8-row sublane blocks (halo and T are
        # multiples of 8) — written as 8·clip(…) so Mosaic's divisibility
        # check on the HBM slice offset passes syntactically
        return 8 * jnp.clip((jj * T - halo) // 8, 0, (h - rb) // 8)

    def dma(f, slot):
        bb = f // n_j
        jj = f % n_j
        return pltpu.make_async_copy(
            heat_hbm.at[bb, pl.dslice(row0_of(jj), rb)],
            xs2.at[slot], sem2.at[slot])

    slot = jax.lax.rem(flat, 2)
    if pipelined:
        @pl.when(flat == 0)
        def _():
            dma(0, 0).start()
        dma_wait = dma(flat, slot)
        dma_wait.wait()
        @pl.when(flat + 1 < total)
        def _():
            dma(flat + 1, 1 - slot).start()
    else:
        dma(flat, slot).start()
        dma(flat, slot).wait()

    x = xs2[slot].astype(jnp.float32)            # (rb, w)

    # with the clamped DMA every buffer row is a real image row (local
    # row i ↔ image row row0 + i) — image top/bottom padding enters the
    # window maxes only through the lane/row shift sentinels, exactly
    # like reduce_window(SAME)'s -inf: a window centred in-image never
    # spans rows outside the clamped rb-row block
    row0 = row0_of(j)
    row_iota = lax.broadcasted_iota(jnp.int32, (rb, w), 0)
    lane_iota = lax.broadcasted_iota(jnp.int32, (rb, w), 1)
    img_row = row_iota + row0

    def win(v):
        return _win_max_simple(v, radius, lane_iota)

    finite = x > SENTINEL
    wm = win(x)
    max_mask = (x == wm) & finite
    s = x
    for _ in range(iterations):
        supp = win(jnp.where(max_mask, 1.0, 0.0)) > 0.0
        s = jnp.where(supp, SENTINEL, x)
        new_mask = (s == win(s)) & (~supp) & (s > SENTINEL)
        max_mask = max_mask | new_mask

    vw = vwh_ref[b, 0]
    vh = vwh_ref[b, 1]
    valid = ((lane_iota >= border) & (lane_iota < vw - border)
             & (img_row >= border) & (img_row < vh - border))
    sup = jnp.where(max_mask & valid, x, 0.0)

    # central T rows of this program. The local offset j*T - row0 takes
    # exactly three values — 0 (top-edge program), halo (interior),
    # 2·halo (bottom-edge; see row0_of's clip) — so a select over three
    # STATIC slices replaces dynamic_slice (not lowerable in-kernel)
    mid_start = j * T - halo
    c = jnp.where(row0 == mid_start, sup[halo:halo + T],
                  jnp.where(row0 == 0, sup[0:T],
                            sup[2 * halo:2 * halo + T]))

    # 4×4 cell max + in-cell position. vertical: 4 row-planes
    v = c.reshape(T // 4, 4, w)
    r0, r1, r2, r3 = v[:, 0], v[:, 1], v[:, 2], v[:, 3]
    vmax = jnp.maximum(jnp.maximum(r0, r1), jnp.maximum(r2, r3))
    vidx = jnp.where(vmax == r0, 0.0,
                     jnp.where(vmax == r1, 1.0,
                               jnp.where(vmax == r2, 2.0, 3.0)))
    # horizontal: lanes 4c..4c+3 → winner at lane 4c
    li = lax.broadcasted_iota(jnp.int32, vmax.shape, 1)
    h0 = vmax
    h1 = _shift_lanes(vmax, 1, SENTINEL, li)
    h2 = _shift_lanes(vmax, 2, SENTINEL, li)
    h3 = _shift_lanes(vmax, 3, SENTINEL, li)
    cmax = jnp.maximum(jnp.maximum(h0, h1), jnp.maximum(h2, h3))
    hidx = jnp.where(cmax == h0, 0.0,
                     jnp.where(cmax == h1, 1.0,
                               jnp.where(cmax == h2, 2.0, 3.0)))
    # in-cell sub position = vidx(win) * 4 + hidx, with vidx gathered at
    # the winning lane via the same shifts
    v1 = _shift_lanes(vidx, 1, 0.0, li)
    v2 = _shift_lanes(vidx, 2, 0.0, li)
    v3 = _shift_lanes(vidx, 3, 0.0, li)
    vsel = jnp.where(hidx == 0.0, vidx,
                     jnp.where(hidx == 1.0, v1,
                               jnp.where(hidx == 2.0, v2, v3)))
    sub = vsel * 4.0 + hidx

    # 1-in-4 lane compaction via selection matmul (W, W/4)
    sel = (lax.broadcasted_iota(jnp.int32, (w, w // 4), 0)
           == 4 * lax.broadcasted_iota(jnp.int32, (w, w // 4), 1)
           ).astype(jnp.float32)
    cmax_c = jax.lax.dot_general(
        cmax, sel, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    sub_c = jax.lax.dot_general(
        sub * (cmax > 0.0), sel, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    cmax_ref[0] = cmax_c
    csub_ref[0] = sub_c


@functools.partial(jax.jit,
                   static_argnames=("radius", "border", "iterations",
                                    "interpret"))
def nms_cellmax(heat, valid_wh, radius=4, border=4, iterations=2,
                interpret=False):
    """heat: (B, H, W) bf16/f32; valid_wh: (B, 2) int32 (w, h).
    Returns (cellmax, cellsub): (B, H/4, W/4) f32 — per-4×4-cell NMS'd
    score max and flat in-cell position (4·dy + dx)."""
    b, h, w = heat.shape
    halo = _halo(radius, iterations)
    rb = T + 2 * halo
    kernel = functools.partial(
        _kernel, h=h, w=w, n_b=b, radius=radius, iterations=iterations,
        border=border, halo=halo, pipelined=not interpret)
    grid = (b, h // T)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            # full-array SMEM block (Mosaic rejects sub-(8,128) blocks
            # that aren't the whole array); kernel indexes row b itself
            pl.BlockSpec((b, 2), lambda bb, jj: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=[
            pl.BlockSpec((1, T // 4, w // 4), lambda bb, jj: (bb, jj, 0)),
            pl.BlockSpec((1, T // 4, w // 4), lambda bb, jj: (bb, jj, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h // 4, w // 4), jnp.float32),
            jax.ShapeDtypeStruct((b, h // 4, w // 4), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, rb, w), heat.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(valid_wh, heat)


def select_keypoints(heat, valid_wh, k, threshold, radius=4, border=4,
                     interpret=False):
    """Fused replacement for per-image ``simple_nms → border_mask →
    select_topk_keypoints`` at the SuperPoint operating point. Returns
    batched (kpts (B,k,2) xy f32, scores (B,k) f32, mask (B,k) bool)."""
    b, hh, ww = heat.shape
    cmax, csub = nms_cellmax(heat, valid_wh, radius, border,
                             interpret=interpret)
    wc = ww // 4
    flat = cmax.reshape(b, -1)
    if k < flat.shape[1]:
        kscores, idx = lax.approx_max_k(flat, k, recall_target=0.99)
    else:
        # small image / large k: fewer 4×4 cells than requested
        # keypoints — take every cell (padded with -inf beyond the
        # grid) so the threshold mask below zeroes the excess slots
        pad = k - flat.shape[1]
        flat = jnp.pad(flat, ((0, 0), (0, pad)),
                       constant_values=-jnp.inf)
        kscores, idx = lax.top_k(flat, k)
        idx = jnp.minimum(idx, wc * (hh // 4) - 1)
    sub = jnp.take_along_axis(csub.reshape(b, -1), idx, axis=1)
    cy = (idx // wc).astype(jnp.float32)
    cx = (idx % wc).astype(jnp.float32)
    ys = cy * 4.0 + jnp.floor(sub / 4.0)
    xs = cx * 4.0 + jnp.mod(sub, 4.0)
    kpts = jnp.stack([xs, ys], -1)
    mask = kscores > threshold
    kscores = jnp.where(mask, kscores, 0.0)
    kpts = jnp.where(mask[..., None], kpts, 0.0)
    return kpts, kscores, mask
