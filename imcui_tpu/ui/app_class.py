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
        img_warped, _ = self.make_warped(pred, choice_geometry_type)
        pred_file = self.dump_pred(pred)
        return (img_kpts, img_raw, img_ransac, stats, pred, img_warped,
                pred_file)

    @staticmethod
    def make_warped(pred, choice_geometry_type):
        """Warped-pair panel (reference: ui/utils.py generate_warp_images
        wiring at app_class.py:293-300). Returns (figure, warped_img1)."""
        from .utils import generate_warp_images

        try:
            return generate_warp_images(
                pred.get("image0_orig"), pred.get("image1_orig"), pred,
                choice_geometry_type)
        except Exception as e:  # degenerate geometry: panel stays empty
            logger.debug(f"warp panel unavailable: {e}")
            return None, None

    @staticmethod
    def dump_pred(pred):
        """Pickle the prediction for the downloadable-output widget
        (reference: ui/utils.py:1047-1057 — images stripped, arrays
        kept)."""
        import pickle
        import tempfile

        slim = {k: v for k, v in pred.items()
                if not str(k).startswith("image") and v is not None}
        f = tempfile.NamedTemporaryFile(
            mode="wb", suffix=".pkl", delete=False, prefix="imcui_pred_")
        with f:
            pickle.dump(slim, f)
        return f.name

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
                    with gr.Row():
                        matcher_key = gr.Dropdown(
                            matcher_list, label="Matching Model",
                            value=matcher_list[0] if matcher_list else None,
                        )
                        match_image_src = gr.Radio(
                            ["upload", "webcam", "clipboard"],
                            label="Image Source", value="upload",
                        )
                    input_image0 = gr.Image(label="Image 0", type="numpy",
                                            image_mode="RGB",
                                            interactive=True)
                    input_image1 = gr.Image(label="Image 1", type="numpy",
                                            image_mode="RGB",
                                            interactive=True)
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
                            image_force_resize_cb = gr.Checkbox(
                                label="Force Resize", value=False,
                                interactive=True)
                            image_setting_width = gr.Slider(
                                64, 2048, 640, step=16, label="Image Width",
                                visible=False)
                            image_setting_height = gr.Slider(
                                48, 2048, 480, step=16, label="Image Height",
                                visible=False)
                    with gr.Row():
                        button_run = gr.Button(value="Run Match",
                                               variant="primary")
                        button_stop = gr.Button(value="Stop")
                        button_reset = gr.Button(value="Reset")
                        button_rerun_ransac = gr.Button(
                            value="Rerun RANSAC")
                with gr.Column():
                    with gr.Accordion("Keypoints", open=True):
                        output_keypoints = gr.Image(label="Keypoints",
                                                    type="numpy")
                    with gr.Accordion(
                            "Raw Matches (green good, red bad)", open=False):
                        output_matches_raw = gr.Image(label="Raw Matches",
                                                      type="numpy")
                    with gr.Accordion(
                            "RANSAC Matches (green good, red bad)",
                            open=True):
                        output_matches_ransac = gr.Image(
                            label="RANSAC Matches", type="numpy")
                    with gr.Accordion("Matches Statistics", open=False):
                        output_pred = gr.File(label="Outputs",
                                              elem_id="download")
                        matches_result_info = gr.JSON(
                            label="Matches Statistics")
                    with gr.Accordion("Warped Image", open=True):
                        output_wrapped = gr.Image(label="Warped Pair",
                                                  type="numpy")
                        button_rerun_warp = gr.Button(
                            value="Send Warped Image1 to Input")

            inputs = [
                input_image0, input_image1, match_setting_threshold,
                match_setting_max_keypoints, detect_keypoints_threshold,
                matcher_key, ransac_method, ransac_reproj_threshold,
                ransac_confidence, ransac_max_iter, choice_geometry_type,
                image_force_resize_cb, image_setting_width,
                image_setting_height,
            ]
            outputs = [
                output_keypoints, output_matches_raw, output_matches_ransac,
                matches_result_info, state_cache, output_wrapped,
                output_pred,
            ]
            run_event = button_run.click(
                fn=self.run_matching_ui, inputs=inputs, outputs=outputs
            )
            button_stop.click(fn=None, cancels=[run_event])
            button_reset.click(
                fn=self.ui_reset_state, inputs=[],
                outputs=inputs[:6] + outputs[:4] + [state_cache]
                + inputs[6:11],
            )
            button_rerun_ransac.click(
                fn=lambda cache, m, r, c, i: self._rerun(cache, m, r, c, i),
                inputs=[state_cache, ransac_method, ransac_reproj_threshold,
                        ransac_confidence, ransac_max_iter],
                outputs=[output_matches_ransac, matches_result_info],
            )
            button_rerun_warp.click(
                fn=self._send_warped_to_input,
                inputs=[state_cache, choice_geometry_type],
                outputs=[input_image1],
            )
            # image source switch (upload / webcam / clipboard)
            match_image_src.change(
                fn=self._on_select_image_src,
                inputs=match_image_src,
                outputs=[input_image0, input_image1],
            )
            # force-resize reveals the width/height sliders
            image_force_resize_cb.select(
                fn=self._on_select_force_resize,
                inputs=image_force_resize_cb,
                outputs=[image_setting_width, image_setting_height],
            )
            # honest RANSAC UI: the on-device estimator draws a fixed
            # hypothesis batch — confidence/max-iter are no-ops there
            # (ops/ransac.py); reflect that instead of showing live
            # sliders whose values do nothing
            ransac_method.change(
                fn=self._on_select_ransac_method,
                inputs=ransac_method,
                outputs=[ransac_confidence, ransac_max_iter],
            )
            with gr.Accordion("Examples (click a row to populate)",
                              open=True):
                from .examples import gen_examples

                try:
                    rows = gen_examples(
                        self.example_data_root or
                        Path(__file__).parent.parent / "datasets")
                except Exception as e:
                    logger.warning(f"examples unavailable: {e}")
                    rows = []
                if rows:
                    gr.Examples(
                        examples=rows,
                        inputs=[input_image0, input_image1, matcher_key],
                        outputs=[], cache_examples=False,
                        label="Examples (image0, image1, model)",
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

    # -- control callbacks (reference: app_class.py:436-470) -----------

    @staticmethod
    def _on_select_image_src(choice):
        """Switch the image boxes' sources (upload/webcam/clipboard)."""
        upd = gr.update(sources=[choice] if choice != "upload"
                        else ["upload", "webcam", "clipboard"])
        return upd, upd

    @staticmethod
    def _on_select_force_resize(visible=False):
        return gr.update(visible=visible), gr.update(visible=visible)

    @staticmethod
    def _on_select_ransac_method(method):
        """TPU_LORANSAC draws a fixed Gumbel-sampled hypothesis batch:
        confidence/max-iter do not apply (ops/ransac.py). Disable the
        sliders there; the CV2 USAC estimators honour them."""
        tpu = str(method).startswith("TPU")
        info = ("not used by the TPU estimator (fixed hypothesis batch)"
                if tpu else None)
        return (gr.update(interactive=not tpu, info=info),
                gr.update(interactive=not tpu, info=info))

    def _send_warped_to_input(self, state_cache, choice_geometry_type):
        """Send the warped image1 back into the input slot (reference:
        app_class.py:301-312 'Rerun Matching' loop)."""
        if not state_cache:
            return None
        _, warped = self.make_warped(state_cache, choice_geometry_type)
        return warped

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
