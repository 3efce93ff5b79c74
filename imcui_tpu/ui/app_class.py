"""Gradio WebUI shell (reference contract: imcui/ui/app_class.py:50-826 —
ImageMatchingApp with the same construction args, control panel, outputs,
and event wiring; AppBaseUI/AppSfmUI for the SfM tab).

Gradio is an optional dependency: config/zoo resolution, state handling,
and the per-request pipeline are importable and testable without it; only
``init_interface``/``run`` require gradio.
"""

from pathlib import Path

import numpy as np

from .. import logger
from .sfm import SfmEngine
from .utils import (DEFAULT_RANSAC_CONFIDENCE, DEFAULT_RANSAC_MAX_ITER,
                    DEFAULT_RANSAC_METHOD, DEFAULT_RANSAC_REPROJ_THRESHOLD,
                    get_matcher_zoo, load_config, ransac_zoo, run_matching,
                    run_ransac)
from .viz import display_keypoints, display_matches

try:
    import gradio as gr
except ImportError:
    gr = None

GRADIO_MISSING = (
    "The web UI requires gradio (pip install gradio). The HTTP API "
    "(imcui_tpu.api.server), CLI (imcui_tpu.cli.main match) and the "
    "python API (imcui_tpu.api.core.ImageMatchingAPI) work without it."
)


class ImageMatchingApp:
    def __init__(self, server_name=None, server_port=None, config=None,
                 example_data_root=None, **kwargs):
        conf_path = config or (
            Path(__file__).parent.parent / "config" / "app.yaml"
        )
        self.cfg = load_config(conf_path)
        self.server_name = server_name or self.cfg.get("server", {}).get(
            "name", "0.0.0.0")
        self.server_port = server_port or self.cfg.get("server", {}).get(
            "port", 7860)
        self.example_data_root = example_data_root
        self.matcher_zoo = get_matcher_zoo(self.cfg["matcher_zoo"])
        self.app = None
        if gr is not None:
            self.init_interface()

    # -- pipeline callbacks (usable without gradio) ---------------------

    def run_matching_ui(self, image0, image1, match_threshold,
                        extract_max_keypoints, keypoint_threshold, key,
                        ransac_method=DEFAULT_RANSAC_METHOD,
                        ransac_reproj_threshold=DEFAULT_RANSAC_REPROJ_THRESHOLD,
                        ransac_confidence=DEFAULT_RANSAC_CONFIDENCE,
                        ransac_max_iter=DEFAULT_RANSAC_MAX_ITER,
                        choice_geometry_type="Homography",
                        force_resize=False, image_width=640,
                        image_height=480):
        """The per-request generator (reference: ui/utils.py:832-1095 —
        yields keypoints panel, raw panel, ransac panel, stats, state)."""
        pred = run_matching(
            image0, image1,
            match_threshold=match_threshold,
            extract_max_keypoints=extract_max_keypoints,
            keypoint_threshold=keypoint_threshold,
            key=key,
            ransac_method=ransac_method,
            ransac_reproj_threshold=ransac_reproj_threshold,
            ransac_confidence=ransac_confidence,
            ransac_max_iter=ransac_max_iter,
            choice_geometry_type=choice_geometry_type,
            matcher_zoo=self.matcher_zoo,
            force_resize=force_resize,
            image_width=image_width,
            image_height=image_height,
        )
        img_kpts = display_keypoints(pred)
        img_raw, n_raw = display_matches(pred, tag="KPTS_RAW")
        img_ransac, n_ransac = display_matches(pred, tag="KPTS_RANSAC")
        stats = {
            "num_raw_matches": int(n_raw),
            "num_ransac_matches": int(n_ransac),
        }
        return img_kpts, img_raw, img_ransac, stats, pred

    @staticmethod
    def ui_reset_state(*args):
        """Reference parity: app_class.py:463-525."""
        return (
            None, None,  # images
            0.2, 1000, 0.015,  # thresholds
            None,  # matcher key
            None, None, None,  # output panels
            {},  # stats
            None,  # state
            DEFAULT_RANSAC_METHOD,
            DEFAULT_RANSAC_REPROJ_THRESHOLD,
            DEFAULT_RANSAC_CONFIDENCE,
            DEFAULT_RANSAC_MAX_ITER,
            "Homography",
        )

    def display_supported_algorithms(self, style="tab"):
        """Reference parity: app_class.py:527-582 — the algorithms table."""
        data = []
        for k, v in self.cfg["matcher_zoo"].items():
            if not v.get("enable", True):
                continue
            info = v.get("info", {})
            data.append(
                [
                    k, info.get("name", k), info.get("source", ""),
                    info.get("github", ""), info.get("paper", ""),
                    info.get("efficiency", ""),
                ]
            )
        return data

    # -- gradio UI ------------------------------------------------------

    def init_interface(self):
        if gr is None:
            raise ImportError(GRADIO_MISSING)
        matcher_list = list(self.matcher_zoo.keys())
        with gr.Blocks() as app:
            gr.Markdown("# Image Matching WebUI (TPU)")
            state_cache = gr.State({})
            with gr.Row():
                with gr.Column():
                    input_image0 = gr.Image(label="Image 0", type="numpy")
                    input_image1 = gr.Image(label="Image 1", type="numpy")
                    matcher_key = gr.Dropdown(
                        matcher_list, label="Matching Model",
                        value=matcher_list[0] if matcher_list else None,
                    )
                    with gr.Accordion("Advanced Setting", open=False):
                        match_setting_threshold = gr.Slider(
                            0.0, 1.0, 0.2, step=0.001,
                            label="Match threshold")
                        match_setting_max_keypoints = gr.Slider(
                            10, 10000, 1024, step=10, label="Max keypoints")
                        detect_keypoints_threshold = gr.Slider(
                            0.0, 1.0, 0.015, step=0.001,
                            label="Keypoint threshold")
                        ransac_method = gr.Dropdown(
                            list(ransac_zoo.keys()),
                            value=DEFAULT_RANSAC_METHOD,
                            label="RANSAC Method")
                        ransac_reproj_threshold = gr.Slider(
                            0.0, 12.0, DEFAULT_RANSAC_REPROJ_THRESHOLD,
                            step=0.01, label="RANSAC reproj threshold")
                        ransac_confidence = gr.Slider(
                            0.0, 1.0, DEFAULT_RANSAC_CONFIDENCE,
                            step=0.00001, label="RANSAC confidence")
                        ransac_max_iter = gr.Slider(
                            0.0, 100000, DEFAULT_RANSAC_MAX_ITER,
                            step=100, label="RANSAC max iters")
                        choice_geometry_type = gr.Radio(
                            ["Fundamental", "Homography"],
                            value="Homography", label="Geometry")
                    with gr.Row():
                        button_run = gr.Button(value="Run Match",
                                               variant="primary")
                        button_stop = gr.Button(value="Stop")
                        button_reset = gr.Button(value="Reset")
                        button_rerun_ransac = gr.Button(
                            value="Rerun RANSAC")
                with gr.Column():
                    output_keypoints = gr.Image(label="Keypoints",
                                                type="numpy")
                    output_matches_raw = gr.Image(label="Raw Matches",
                                                  type="numpy")
                    output_matches_ransac = gr.Image(
                        label="RANSAC Matches", type="numpy")
                    matches_result_info = gr.JSON(label="Matches Statistics")

            inputs = [
                input_image0, input_image1, match_setting_threshold,
                match_setting_max_keypoints, detect_keypoints_threshold,
                matcher_key, ransac_method, ransac_reproj_threshold,
                ransac_confidence, ransac_max_iter, choice_geometry_type,
            ]
            outputs = [
                output_keypoints, output_matches_raw, output_matches_ransac,
                matches_result_info, state_cache,
            ]
            run_event = button_run.click(
                fn=self.run_matching_ui, inputs=inputs, outputs=outputs
            )
            button_stop.click(fn=None, cancels=[run_event])
            button_reset.click(
                fn=self.ui_reset_state, inputs=[],
                outputs=inputs[:6] + outputs[:4] + [state_cache]
                + inputs[6:],
            )
            button_rerun_ransac.click(
                fn=lambda cache, m, r, c, i: self._rerun(cache, m, r, c, i),
                inputs=[state_cache, ransac_method, ransac_reproj_threshold,
                        ransac_confidence, ransac_max_iter],
                outputs=[output_matches_ransac, matches_result_info],
            )
            with gr.Tab("Structure from Motion"):
                AppSfmUI(self.cfg)

            gr.Markdown("## Supported Algorithms")
            gr.Dataframe(
                value=self.display_supported_algorithms(),
                headers=["key", "name", "source", "github", "paper",
                         "efficiency"],
            )
        self.app = app

    def _rerun(self, state_cache, method, reproj, conf, iters):
        pred = run_ransac(state_cache, "Homography", method, reproj, conf,
                          iters)
        if pred is None:
            return None, {}
        img, n = display_matches(pred, tag="KPTS_RANSAC")
        return img, {"num_ransac_matches": int(n)}

    def run(self):
        """Reference parity: app_class.py:423-433."""
        if gr is None or self.app is None:
            raise ImportError(GRADIO_MISSING)
        self.app.queue().launch(
            server_name=self.server_name, server_port=self.server_port,
            share=False,
        )


class AppBaseUI:
    """Shared widgets for secondary tabs (reference: app_class.py:585)."""

    def __init__(self, cfg=None):
        self.cfg = cfg or {}


class AppSfmUI(AppBaseUI):
    """SfM tab (reference contract: app_class.py:585-826)."""

    def __init__(self, cfg=None):
        super().__init__(cfg)
        self.sfm_engine = SfmEngine(cfg)
        if gr is not None:
            self._build()

    def _build(self):
        with gr.Row():
            with gr.Column():
                input_images = gr.File(label="SfM", file_count="multiple")
                camera_model = gr.Dropdown(
                    ["PINHOLE", "SIMPLE_RADIAL", "OPENCV"],
                    value="PINHOLE", label="Camera Model")
                scene_graph = gr.Dropdown(
                    ["all", "swin", "oneref"], value="all",
                    label="Scene Graph")
                global_feature = gr.Dropdown(
                    ["netvlad"], value="netvlad",
                    label="Global Features")
                top_k = gr.Slider(1, 100, 10, step=1, label="Top K")
                button_sfm = gr.Button("Run SFM", variant="primary")
            with gr.Column():
                model_3d = gr.Model3D()
                output_image = gr.Image(label="SFM Visualize")
        button_sfm.click(
            fn=lambda imgs, cam, sg, gf, k: self._run(imgs, cam, sg, gf, k),
            inputs=[input_images, camera_model, scene_graph, global_feature,
                    top_k],
            outputs=[model_3d, output_image],
        )

    def _run(self, images, camera_model, scene_graph, global_feature,
             top_k):
        if not images:
            logger.info("No images provided to SfM.")
            return None, None
        ret = self.sfm_engine.call(
            None, [f.name if hasattr(f, "name") else f for f in images],
            camera_model=camera_model, scene_graph=scene_graph,
            global_feature=global_feature, top_k=int(top_k),
        )
        if ret and ret.get("obj"):
            return ret["obj"], None
        return None, None
