"""Match visualization (reference contract: imcui/ui/viz.py:76-508 — same
entry points plot_images / make_matching_figure / display_matches /
display_keypoints / fig2im, same green→red confidence colormap)."""

import io

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402


def error_colormap(err, thr=0.5, alpha=1.0):
    """Confidence → RGBA, green (good) → red (bad) (reference parity:
    imcui/ui/viz.py:261-279)."""
    x = 1 - np.clip(err / (thr * 2), 0, 1)
    return np.clip(
        np.stack([2 - x * 2, x * 2, np.zeros_like(x),
                  np.ones_like(x) * alpha], -1),
        0, 1,
    )


def plot_images(imgs, titles=None, cmaps="gray", dpi=100, size=6, pad=0.5):
    """Aspect-correct side-by-side image figure (reference parity:
    imcui/ui/viz.py:76-116). Returns the matplotlib figure."""
    n = len(imgs)
    if not isinstance(cmaps, (list, tuple)):
        cmaps = [cmaps] * n
    ratios = [i.shape[1] / i.shape[0] for i in imgs]
    figsize = [sum(ratios) * size * 0.75, size * 0.75]
    fig, ax = plt.subplots(
        1, n, figsize=figsize, dpi=dpi,
        gridspec_kw={"width_ratios": ratios},
    )
    if n == 1:
        ax = [ax]
    for i in range(n):
        img = imgs[i]
        ax[i].imshow(img, cmap=plt.get_cmap(cmaps[i])
                     if img.ndim == 2 else None)
        ax[i].get_yaxis().set_ticks([])
        ax[i].get_xaxis().set_ticks([])
        for spine in ax[i].spines.values():
            spine.set_visible(False)
        if titles:
            ax[i].set_title(titles[i])
    fig.tight_layout(pad=pad)
    return fig


def plot_keypoints(kpts, colors="lime", ps=4, axes=None):
    """Scatter keypoints on the current figure's axes (reference parity:
    imcui/hloc/utils/viz.py plot_keypoints)."""
    if axes is None:
        axes = plt.gcf().axes
    if not isinstance(colors, list):
        colors = [colors] * len(kpts)
    for ax, k, c in zip(axes, kpts, colors):
        if k is not None and len(k):
            k = np.asarray(k)
            ax.scatter(k[:, 0], k[:, 1], c=c, s=ps, linewidths=0)


def plot_matches(kpts0, kpts1, color=None, lw=1.5, ps=4, a=1.0, fig=None):
    """Draw match lines across the two subplots (reference parity:
    imcui/ui/viz.py make_matching_figure line rendering)."""
    if fig is None:
        fig = plt.gcf()
    ax = fig.axes
    ax0, ax1 = ax[0], ax[1]
    kpts0 = np.asarray(kpts0)
    kpts1 = np.asarray(kpts1)
    if color is None:
        color = [(0.0, 1.0, 0.0, a)] * len(kpts0)
    if len(kpts0) == 0:
        return fig
    fig.canvas.draw()
    transFigure = fig.transFigure.inverted()
    fkpts0 = transFigure.transform(ax0.transData.transform(kpts0))
    fkpts1 = transFigure.transform(ax1.transData.transform(kpts1))
    fig.lines += [
        matplotlib.lines.Line2D(
            (fkpts0[i, 0], fkpts1[i, 0]),
            (fkpts0[i, 1], fkpts1[i, 1]),
            transform=fig.transFigure, c=color[i], linewidth=lw, alpha=a,
        )
        for i in range(len(kpts0))
    ]
    ax0.scatter(kpts0[:, 0], kpts0[:, 1], c=color, s=ps)
    ax1.scatter(kpts1[:, 0], kpts1[:, 1], c=color, s=ps)
    return fig


def _distinct_colors(n, seed=0):
    """n visually-distinct RGB colors via evenly-spaced hues (stands in
    for the reference's seaborn husl palette without the dependency)."""
    if n == 0:
        return np.zeros((0, 3))
    hues = (np.arange(n) / max(n, 1) + 0.13) % 1.0
    rng = np.random.default_rng(seed)
    rng.shuffle(hues)
    import colorsys

    return np.array([colorsys.hsv_to_rgb(h, 0.9, 0.85) for h in hues])


def plot_color_line_matches(lines, correct_matches=None, lw=2.0,
                            indices=(0, 1), fig=None):
    """Draw matched line segments in per-match colors on an existing
    two-image figure (reference parity: imcui/ui/viz.py:119-170
    plot_color_line_matches — same (N,2,2) segment convention, same
    low-alpha treatment of incorrect matches).

    Args:
        lines: list of two (N, 2, 2) arrays of [endpoint0, endpoint1]
            in (x, y) pixel coordinates, one per image.
        correct_matches: optional (N,) bool; wrong matches get alpha .2.
    """
    if fig is None:
        fig = plt.gcf()
    n_lines = len(lines[0])
    colors = _distinct_colors(n_lines)
    alphas = np.ones(n_lines)
    if correct_matches is not None:
        alphas[~np.asarray(correct_matches)] = 0.2
    axes = [fig.axes[i] for i in indices]
    fig.canvas.draw()
    transFigure = fig.transFigure.inverted()
    for a, segs in zip(axes, lines):
        segs = np.asarray(segs, dtype=float)
        if segs.size == 0:
            continue
        e0 = transFigure.transform(a.transData.transform(segs[:, 0]))
        e1 = transFigure.transform(a.transData.transform(segs[:, 1]))
        fig.lines += [
            matplotlib.lines.Line2D(
                (e0[i, 0], e1[i, 0]), (e0[i, 1], e1[i, 1]),
                zorder=1, transform=fig.transFigure,
                c=colors[i], alpha=alphas[i], linewidth=lw,
            )
            for i in range(len(segs))
        ]
    return fig


def add_text(idx, text, pos=(0.01, 0.99), fs=15, color="w",
             lcolor="k", lwidth=2, ha="left", va="top"):
    """Reference parity: imcui/hloc/utils/viz.py add_text."""
    import matplotlib.patheffects as path_effects

    ax = plt.gcf().axes[idx]
    t = ax.text(*pos, text, fontsize=fs, ha=ha, va=va, color=color,
                transform=ax.transAxes)
    if lcolor is not None:
        t.set_path_effects(
            [
                path_effects.Stroke(linewidth=lwidth, foreground=lcolor),
                path_effects.Normal(),
            ]
        )


def fig2im(fig):
    """Figure → RGB uint8 array (reference parity:
    imcui/ui/viz.py:282-303)."""
    buf = io.BytesIO()
    fig.savefig(buf, format="raw", dpi=fig.dpi)
    arr = np.frombuffer(buf.getvalue(), dtype=np.uint8)
    npix = arr.size // 4
    w_px, h_px = fig.canvas.get_width_height()
    if w_px * h_px != npix:  # dpi scaling happened — infer height
        h_px = npix // w_px
    im = arr.reshape(h_px, w_px, 4)[:, :, :3].copy()
    plt.close(fig)
    return im


def display_keypoints(pred: dict, titles=None):
    """Keypoint panel (reference parity: imcui/ui/viz.py:399-411)."""
    img0 = pred["image0_orig"]
    img1 = pred["image1_orig"]
    if titles is None:
        titles = ["Image 0 - Keypoints", "Image 1 - Keypoints"]
    fig = plot_images([img0, img1], titles=titles, dpi=100)
    if "keypoints0_orig" in pred and "keypoints1_orig" in pred:
        plot_keypoints([pred["keypoints0_orig"], pred["keypoints1_orig"]])
        text = (
            f"# keypoints0: {len(pred['keypoints0_orig'])} \n"
            f"# keypoints1: {len(pred['keypoints1_orig'])}"
        )
        add_text(0, text, fs=15)
    return fig2im(fig)


def display_matches(pred: dict, titles=None, tag="KPTS_RAW",
                    texts=None, dpi=100):
    """Match panel: raw or RANSAC (reference parity:
    imcui/ui/viz.py:414-508). Returns (image, num_matches)."""
    img0 = pred["image0_orig"]
    img1 = pred["image1_orig"]
    num_inliers = 0
    if tag == "KPTS_RAW":
        mkpts0 = pred.get("mkeypoints0_orig")
        mkpts1 = pred.get("mkeypoints1_orig")
        mconf = pred.get("mconf")
    else:  # KPTS_RANSAC
        mkpts0 = pred.get("mmkeypoints0_orig")
        mkpts1 = pred.get("mmkeypoints1_orig")
        mconf = pred.get("mmconf")
    # reference emits line0_orig/line1_orig; our dense pipeline emits
    # lines0_orig/lines1_orig — accept both spellings
    lines0 = pred.get("lines0_orig", pred.get("line0_orig"))
    lines1 = pred.get("lines1_orig", pred.get("line1_orig"))
    if titles is None:
        titles = ["Image 0 - matched", "Image 1 - matched"]
    if mkpts0 is not None and mkpts1 is not None and len(mkpts0):
        fig = plot_images([img0, img1], titles=titles, dpi=dpi)
        num_inliers = len(mkpts0)
        if mconf is None or len(mconf) != len(mkpts0):
            mconf = np.ones(len(mkpts0))
        color = error_colormap(1.0 - np.asarray(mconf), thr=0.5, alpha=0.6)
        plot_matches(mkpts0, mkpts1, color=color, fig=fig)
        add_text(0, f"# matches: {num_inliers}", fs=15)
        return fig2im(fig), num_inliers
    if lines0 is not None and lines1 is not None and len(lines0):
        # line-matcher branch (reference parity: imcui/ui/viz.py:474-508
        # — colored line segments; endpoint-match panel stacked below
        # when line keypoints exist)
        num_inliers = len(lines0)
        fig = plot_images(
            [np.squeeze(img0), np.squeeze(img1)],
            titles=["Image 0 - matched lines", "Image 1 - matched lines"],
            dpi=dpi,
        )
        plot_color_line_matches([lines0, lines1], lw=2, fig=fig)
        im_lines = fig2im(fig)
        lk0 = pred.get("line_keypoints0_orig")
        lk1 = pred.get("line_keypoints1_orig")
        if lk0 is not None and lk1 is not None and len(lk0):
            num_inliers = len(lk0)
            mconf = pred.get("mconf")
            if mconf is None or len(mconf) != len(lk0):
                mconf = np.ones(len(lk0))
            fig2 = plot_images([img0, img1], titles=titles, dpi=dpi)
            color = error_colormap(1.0 - np.asarray(mconf), thr=0.5,
                                   alpha=0.6)
            plot_matches(lk0, lk1, color=color, fig=fig2)
            add_text(0, f"# line matches: {num_inliers}", fs=15)
            im_kpts = fig2im(fig2)
            if im_lines.shape[1] != im_kpts.shape[1]:
                # widths can differ by a pixel from dpi rounding — crop
                w = min(im_lines.shape[1], im_kpts.shape[1])
                im_lines, im_kpts = im_lines[:, :w], im_kpts[:, :w]
            return np.concatenate([im_kpts, im_lines], axis=0), num_inliers
        return im_lines, num_inliers
    fig = plot_images([img0, img1], titles=titles, dpi=dpi)
    return fig2im(fig), num_inliers
