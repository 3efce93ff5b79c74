"""Click CLI (reference contract: imcui/cli/main.py:52-143 — same flags
--server-name/-s, --server-port/-p, --config/-c, --example-data-root/-d,
--verbose/-v, --version; same config resolution order).
"""

import sys
from pathlib import Path

import click

from .. import __version__, logger


def get_default_config_path():
    """Config resolution order (reference parity: imcui/cli/main.py:12-37):
    cwd app.yaml → cwd config/app.yaml → packaged default."""
    candidates = [
        Path.cwd() / "app.yaml",
        Path.cwd() / "config" / "app.yaml",
        Path(__file__).parent.parent / "config" / "app.yaml",
    ]
    for c in candidates:
        if c.exists():
            return c
    raise FileNotFoundError(
        "No app.yaml found in cwd, ./config, or the package defaults."
    )


@click.group(invoke_without_command=True)
@click.option("--server-name", "-s", default=None,
              help="Server bind address (overrides config).")
@click.option("--server-port", "-p", default=None, type=int,
              help="Server port (overrides config).")
@click.option("--config", "-c", "config_path", default=None,
              type=click.Path(exists=True),
              help="Path to an app.yaml config.")
@click.option("--example-data-root", "-d", default=None,
              type=click.Path(), help="Root for example image data.")
@click.option("--verbose", "-v", is_flag=True, help="Verbose logging.")
@click.version_option(__version__, "--version")
@click.pass_context
def cli(ctx, server_name, server_port, config_path, example_data_root,
        verbose):
    """imcui-tpu — TPU-native image matching webui/API."""
    if verbose:
        import logging

        logger.setLevel(logging.DEBUG)
    if ctx.invoked_subcommand is not None:
        ctx.ensure_object(dict)
        ctx.obj.update(
            dict(server_name=server_name, server_port=server_port,
                 config_path=config_path,
                 example_data_root=example_data_root)
        )
        return
    # default command: launch the webui (reference: `imcui` console script)
    ctx.invoke(webui)


@cli.command()
@click.pass_context
def webui(ctx):
    """Launch the Gradio web UI."""
    obj = ctx.obj or {}
    config_path = obj.get("config_path") or get_default_config_path()
    from ..ui.app_class import ImageMatchingApp

    app = ImageMatchingApp(
        server_name=obj.get("server_name"),
        server_port=obj.get("server_port"),
        config=str(config_path),
        example_data_root=obj.get("example_data_root"),
    )
    app.run()


@cli.command()
@click.option("--host", default=None)
@click.option("--port", default=None, type=int)
@click.option("--api-config", default=None, type=click.Path(exists=True))
def serve(host, port, api_config):
    """Launch the HTTP matching API."""
    from ..api.server import main as serve_main

    serve_main(config_path=api_config, host=host, port=port)


@cli.command()
@click.argument("image0", type=click.Path(exists=True))
@click.argument("image1", type=click.Path(exists=True))
@click.option("--matcher", default="superpoint+lightglue")
@click.option("--output", "-o", default=None, type=click.Path())
def match(image0, image1, matcher, output):
    """Match two images from the command line."""
    from ..ui.utils import get_matcher_zoo, load_config, run_matching
    from ..utils.image import read_image

    config = load_config(get_default_config_path())
    zoo = get_matcher_zoo(config["matcher_zoo"])
    pred = run_matching(
        read_image(image0), read_image(image1), key=matcher,
        matcher_zoo=zoo,
    )
    n_raw = len(pred.get("mkeypoints0_orig", []))
    n_ransac = len(pred.get("mmkeypoints0_orig", []))
    click.echo(f"raw matches: {n_raw}, ransac inliers: {n_ransac}")
    if output:
        import pickle

        with open(output, "wb") as f:
            pickle.dump(pred, f)
        click.echo(f"wrote {output}")


@cli.group()
def train():
    """Self-supervised training (beyond-reference: the upstream webui is
    inference-only). Saves numpy-tree checkpoints the serving path loads
    directly."""


@train.command("lightglue")
@click.option("--steps", default=1000, type=int)
@click.option("--batch", default=8, type=int)
@click.option("--size", default=512, type=int)
@click.option("--max-keypoints", default=512, type=int)
@click.option("--n-layers", default=9, type=int)
@click.option("--lr", default=1e-4, type=float)
@click.option("--model-parallel", default=1, type=int,
              help="tp degree over the matcher hidden dims (dp fills "
                   "the rest of the mesh).")
@click.option("--image-dir", default=None, type=click.Path(exists=True),
              help="Real-image corpus; omitted = on-device synthetic.")
@click.option("--eval-every", default=200, type=int)
@click.option("--out", default="runs/lg_homog", type=click.Path())
@click.option("--seed", default=0, type=int)
@click.option("--sp-checkpoint-npz", default=None,
              type=click.Path(exists=True),
              help="Locally trained SuperPoint teacher (e.g. the "
                   "'train superpoint-adapted' output).")
@click.option("--init-npz", default=None, type=click.Path(exists=True),
              help="Warm-start the matcher from an earlier checkpoint "
                   "(fine-tuning).")
@click.option("--warp-family", default="similarity",
              type=click.Choice(["similarity", "pose", "mixed"]),
              help="Supervision warps: published similarity family, "
                   "calibrated plane-induced ('pose'), or per-sample "
                   "mix.")
@click.option("--pose-frac", default=0.5, type=float)
def train_lightglue_cmd(steps, batch, size, max_keypoints, n_layers, lr,
                        model_parallel, image_dir, eval_every, out, seed,
                        sp_checkpoint_npz, init_npz, warp_family,
                        pose_frac):
    """LightGlue homography pre-training (frozen SuperPoint teacher)."""
    from ..train.drivers import train_lightglue

    train_lightglue(steps=steps, batch=batch, size=size,
                    max_keypoints=max_keypoints, n_layers=n_layers, lr=lr,
                    model_parallel=model_parallel, image_dir=image_dir,
                    eval_every=eval_every, out=out, seed=seed,
                    sp_checkpoint_npz=sp_checkpoint_npz,
                    init_npz=init_npz, warp_family=warp_family,
                    pose_frac=pose_frac, log_fn=click.echo)


@train.command("loftr")
@click.option("--steps", default=4000, type=int)
@click.option("--batch", default=4, type=int)
@click.option("--size", default=320, type=int)
@click.option("--lr", default=3e-4, type=float)
@click.option("--n-fine", default=128, type=int,
              help="Positive cells given fine supervision per pair.")
@click.option("--w-fine", default=0.25, type=float)
@click.option("--image-dir", default=None, type=click.Path(exists=True),
              help="Real-image corpus; omitted = on-device synthetic.")
@click.option("--exclude", multiple=True,
              help="Path substrings to hold out of the corpus.")
@click.option("--eval-every", default=400, type=int)
@click.option("--out", default="runs/loftr_homog", type=click.Path())
@click.option("--seed", default=0, type=int)
def train_loftr_cmd(steps, batch, size, lr, n_fine, w_fine, image_dir,
                    exclude, eval_every, out, seed):
    """LoFTR homography training (dense coarse NLL + fine l2)."""
    from ..train.drivers import train_loftr

    train_loftr(steps=steps, batch=batch, size=size, lr=lr,
                n_fine=n_fine, w_fine=w_fine, image_dir=image_dir,
                exclude=tuple(exclude), eval_every=eval_every, out=out,
                seed=seed, log_fn=click.echo)


@train.command("superpoint")
@click.option("--steps", default=5000, type=int)
@click.option("--batch", default=8, type=int)
@click.option("--size", default=160, type=int)
@click.option("--lr", default=1e-4, type=float)
@click.option("--lambda-desc", default=1.0, type=float)
@click.option("--out", default="runs/sp_synth", type=click.Path())
@click.option("--seed", default=0, type=int)
def train_superpoint_cmd(steps, batch, size, lr, lambda_desc, out, seed):
    """SuperPoint MagicPoint-stage training on synthetic corners."""
    from ..train.drivers import train_superpoint

    train_superpoint(steps=steps, batch=batch, size=size, lr=lr,
                     lambda_desc=lambda_desc, out=out, seed=seed,
                     log_fn=click.echo)


@train.command("superpoint-adapted")
@click.option("--corpus", required=True, type=click.Path(exists=True),
              help="Real-photo corpus directory (searched recursively).")
@click.option("--exclude", multiple=True,
              help="Path substrings to hold out of the corpus.")
@click.option("--height", default=240, type=int)
@click.option("--width", default=320, type=int)
@click.option("--synth-steps", default=3000, type=int)
@click.option("--adapt-rounds", default=2, type=int)
@click.option("--real-steps", default=1500, type=int)
@click.option("--n-homog", default=48, type=int,
              help="Views aggregated per image when labelling.")
@click.option("--n-max", default=400, type=int)
@click.option("--threshold", default=0.01, type=float)
@click.option("--batch", default=8, type=int)
@click.option("--synth-mix", default=4, type=int,
              help="One synthetic step every N real steps (0 = off).")
@click.option("--lr", default=1e-4, type=float)
@click.option("--out", default="runs/sp_adapted", type=click.Path())
@click.option("--seed", default=0, type=int)
def train_superpoint_adapted_cmd(corpus, exclude, height, width,
                                 synth_steps, adapt_rounds, real_steps,
                                 n_homog, n_max, threshold, batch,
                                 synth_mix, lr, out, seed):
    """Full published SuperPoint recipe: MagicPoint synthetic stage +
    homographic adaptation onto a real-photo corpus."""
    from ..train.drivers import train_superpoint_adapted

    train_superpoint_adapted(
        corpus, exclude=tuple(exclude), size=(height, width),
        synth_steps=synth_steps, adapt_rounds=adapt_rounds,
        real_steps=real_steps, n_homog=n_homog, n_max=n_max,
        threshold=threshold, batch=batch, synth_mix=synth_mix, lr=lr,
        out=out, seed=seed, log_fn=click.echo)


@train.command("superpoint-finetune")
@click.option("--corpus", required=True, type=click.Path(exists=True))
@click.option("--init-npz", required=True, type=click.Path(exists=True),
              help="Trained checkpoint to warm-start from (e.g. "
                   "weights/superpoint_adapted.npz).")
@click.option("--exclude", multiple=True)
@click.option("--height", default=240, type=int)
@click.option("--width", default=320, type=int)
@click.option("--steps", default=1500, type=int)
@click.option("--batch", default=8, type=int)
@click.option("--lr", default=5e-5, type=float)
@click.option("--warp-family", default="mixed",
              type=click.Choice(["similarity", "pose", "mixed"]))
@click.option("--pose-frac", default=0.5, type=float)
@click.option("--out", default="runs/sp_finetune", type=click.Path())
@click.option("--seed", default=0, type=int)
def train_superpoint_finetune_cmd(corpus, init_npz, exclude, height,
                                  width, steps, batch, lr, warp_family,
                                  pose_frac, out, seed):
    """Fine-tune a trained SuperPoint on a wider warp family
    (viewpoint-invariance push for the pose eval)."""
    from ..train.drivers import finetune_superpoint

    finetune_superpoint(corpus, init_npz, exclude=tuple(exclude),
                        size=(height, width), steps=steps, batch=batch,
                        lr=lr, warp_family=warp_family,
                        pose_frac=pose_frac, out=out, seed=seed,
                        log_fn=click.echo)


@cli.group("eval")
def eval_group():
    """Accuracy evaluations (relative pose AUC — the north-star metric;
    BASELINE.md). Consumes real MegaDepth pair lists when available, or
    manufactures calibrated synthetic-pose pairs offline."""


@eval_group.command("pose")
@click.option("--pairs-json", default=None, type=click.Path(exists=True),
              help="Existing pair list (eval/megadepth schema, e.g. "
                   "converted MegaDepth-1500). Omitted = synthesise "
                   "pairs from --corpus.")
@click.option("--corpus", default="runs/corpus_clean",
              type=click.Path(), help="Photo dir for synthetic pairs.")
@click.option("--n-images", default=10, type=int)
@click.option("--n-poses", default=3, type=int,
              help="Pose draws per image.")
@click.option("--height", default=480, type=int)
@click.option("--width", default=640, type=int)
@click.option("--matcher", default="superpoint+lightglue")
@click.option("--max-pairs", default=None, type=int)
@click.option("--ransac-threshold-px", default=0.75, type=float)
@click.option("--subpixel", is_flag=True, default=False,
              help="Soft-argmax peak refinement on the sparse "
                   "extractor (r5 measured: halves flagship pose "
                   "error — BASELINE.md Pose AUC).")
@click.option("--out", default="runs/pose_eval", type=click.Path())
@click.option("--seed", default=0, type=int)
def eval_pose(pairs_json, corpus, n_images, n_poses, height, width,
              matcher, max_pairs, ransac_threshold_px, subpixel, out,
              seed):
    """Relative-pose AUC@5/10/20 through the full on-device chain
    (match -> fundamental RANSAC -> essential -> pose recovery)."""
    import json as _json
    import pathlib as _pathlib

    from ..eval import megadepth, synthpose

    out_dir = _pathlib.Path(out)
    out_dir.mkdir(parents=True, exist_ok=True)
    if pairs_json:
        with open(pairs_json) as f:
            pairs = _json.load(f)
        source = pairs_json
    else:
        photos = sorted(
            p for p in _pathlib.Path(corpus).iterdir()
            if p.suffix.lower() in (".png", ".jpg", ".jpeg", ".ppm",
                                    ".bmp"))[:n_images]
        pairs = synthpose.generate_pairs(
            photos, out_dir / "pairs", n_pose_per_image=n_poses,
            size=(height, width), seed=seed)
        source = f"synthpose({len(photos)} photos x {n_poses} poses)"
    result = megadepth.evaluate_matcher(
        pairs, matcher, max_pairs=max_pairs,
        ransac_threshold_px=ransac_threshold_px,
        feature_opts={"subpixel": True} if subpixel else None)
    summary = {k: (round(v, 4) if isinstance(v, float) else v)
               for k, v in result.items() if k != "errors"}
    click.echo(f"pose eval [{matcher}] on {source}: "
               f"{_json.dumps(summary)}")
    rec = {"matcher": matcher, "source": source,
           "n_pairs": len(pairs), **result}
    with open(out_dir / f"pose_{matcher.replace('/', '_')}.json",
              "w") as f:
        _json.dump(rec, f)
    click.echo(f"wrote {out_dir}/pose_{matcher.replace('/', '_')}.json")


def run():
    try:
        cli(obj={})
    except KeyboardInterrupt:
        sys.exit(130)


if __name__ == "__main__":
    run()
