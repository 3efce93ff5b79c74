"""Headline benchmark: pairs/sec/chip, SuperPoint + LightGlue @1024 kpts.

Runs the fused two-view serving step (extract ×2 → match → on-device
RANSAC, one XLA program — imcui_tpu/pipeline/two_view.py) at the default
operating point from BASELINE.md: 1024 px images, 1024 keypoints, 9
LightGlue layers, 512-hypothesis fundamental RANSAC.

Measurement design (hard-won on the axon tunnel):
- inputs are generated ON DEVICE inside the jitted step, distinct per
  iteration — repeated host buffers get short-circuited somewhere in the
  remote-execution stack and report fantasy numbers (~70× too high), and
  host→device upload through the dev tunnel measures the tunnel, not the
  chip;
- iterations are CHAINED through a scalar accumulator and the final
  value is fetched to host (utils/benchmark.chain_bench): round 3 found
  that jax.block_until_ready can return without waiting on some
  compiled programs through this transport (a scan-heavy ViT-L forward
  "ran" 80 iters in 0.11 s), so a value fetch is the only trusted
  synchronisation point; the chain also prevents any work elision.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline: the reference publishes no numbers and is unmeasurable in
this environment (empty third_party submodules, no GPU, no checkpoint
egress) — BASELINE.md records an A100 estimate of ~50 pairs/s for the
sequential torch pipeline at this operating point; vs_baseline is
value / 50.
"""

import json

import jax
import jax.numpy as jnp

from imcui_tpu.utils.benchmark import chain_bench

A100_REFERENCE_PAIRS_PER_SEC = 50.0

# XLA cost analysis of THIS step (B=4 amortised), measured by compiling
# the identical program on the CPU backend (FLOPs are backend-independent
# HLO properties) — tools/mfu_scoreboard.py; v5e bf16 peak 197 TF/s.
FLAGSHIP_GFLOPS_PER_PAIR = 657.7
PEAK_BF16_TFS = 197.0

BATCH = 4
H = W = 1024
MAX_KPTS = 1024
N_LAYERS = 9
WARMUP = 3
ITERS = 100


def main():
    import pathlib

    from imcui_tpu.pipeline import two_view

    # Prefer upstream checkpoints (download path); with no egress, fall
    # back to the locally trained trees under weights/ so the bench
    # exercises real-weight effects (threshold masking, match pruning)
    # instead of random init. Shapes are static either way, so the
    # metric is comparable across weight sources.
    wdir = pathlib.Path(__file__).resolve().parent / "weights"
    sp_npz = wdir / "superpoint_adapted.npz"
    lg_npz = wdir / "lightglue_selftrained.npz"
    # decide the weight source ONCE (advisor r4): probe the upstream
    # checkpoint; unreachable + local trees present -> locally trained
    from imcui_tpu.utils.weights import download_checkpoint

    use_local = (download_checkpoint("superpoint_v1.pth") is None
                 and sp_npz.exists())
    params, meta = two_view.load_pretrained(
        n_layers=N_LAYERS,
        sp_npz=sp_npz if use_local else None,
        lg_npz=lg_npz if use_local and lg_npz.exists() else None)
    if use_local:
        print(f"using locally trained weights: {meta}", flush=True)
    valid = jnp.tile(jnp.asarray([[W, H]], jnp.int32), (BATCH, 1))

    def step(params, key, acc):
        k0, k1, k2 = jax.random.split(key, 3)
        image0 = jax.random.uniform(k0, (BATCH, 1, H, W), jnp.float32)
        image1 = jax.random.uniform(k1, (BATCH, 1, H, W), jnp.float32)
        out = two_view.match_step(
            params, image0, image1, valid, valid, k2,
            max_keypoints=MAX_KPTS, n_layers=N_LAYERS,
            num_hypotheses=512, ransac="fundamental",
        )
        return acc + out["matching_scores0"].sum() + out["num_inliers"].sum()

    dt, _ = chain_bench(step, params, iters=ITERS, warmup=WARMUP)

    pairs_per_sec = BATCH * ITERS / dt
    achieved_tfs = FLAGSHIP_GFLOPS_PER_PAIR * pairs_per_sec / 1e3
    print(
        json.dumps(
            {
                "metric": "pairs/sec/chip SuperPoint+LightGlue@1024kpts@1024px",
                "value": round(pairs_per_sec, 2),
                "unit": "pairs/s",
                "vs_baseline": round(
                    pairs_per_sec / A100_REFERENCE_PAIRS_PER_SEC, 3
                ),
                # hardware-anchored utilization (BASELINE.md MFU
                # scoreboard) — vs_baseline stays an A100 estimate
                "achieved_tfs": round(achieved_tfs, 1),
                "mfu": round(achieved_tfs / PEAK_BF16_TFS, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
