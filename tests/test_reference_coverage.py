"""Inventory coverage gate: every model module in the reference zoo must
have a native counterpart here — either a same-named module or a
documented checkpoint-variant config on an implemented architecture
(SURVEY.md §2.6/2.7 is the contract; this test keeps the round-over-round
inventory from regressing)."""

from pathlib import Path

import pytest

REFERENCE = Path("/root/reference/imcui/hloc")
REPO = Path(__file__).resolve().parent.parent / "imcui_tpu" / "models"

# reference modules realised as checkpoint/config variants of an
# implemented architecture instead of a same-named module
EXTRACTOR_VARIANTS = {
    "rord": "d2net",          # rotation-robust D2-Net checkpoint
}
MATCHER_VARIANTS = {
    "gim": "dkm",             # GIM-trained DKM checkpoint (+ gim_roma)
}


@pytest.mark.skipif(not REFERENCE.exists(), reason="reference not mounted")
@pytest.mark.parametrize("kind,variants", [
    ("extractors", EXTRACTOR_VARIANTS),
    ("matchers", MATCHER_VARIANTS),
])
def test_zoo_module_coverage(kind, variants):
    ref_names = {p.stem for p in (REFERENCE / kind).glob("*.py")
                 if p.stem != "__init__"}
    ours = {p.stem for p in (REPO / kind).glob("*.py")
            if p.stem != "__init__"}
    missing = []
    for name in sorted(ref_names):
        target = variants.get(name, name)
        if target not in ours:
            missing.append(name)
    assert not missing, f"reference {kind} without a counterpart: {missing}"


@pytest.mark.skipif(not REFERENCE.exists(), reason="reference not mounted")
def test_variant_confs_registered():
    """The checkpoint-variant realisations must be reachable through the
    config registry under their reference names."""
    from imcui_tpu.configs import confs_dict

    assert confs_dict["extractors"]["rord"]["model"]["name"] == "d2net"
    assert confs_dict["matchers"]["gim(dkm)" if "gim(dkm)" in
                                  confs_dict["matchers"] else
                                  "gim"]["model"]["name"] == "dkm"
    assert confs_dict["matchers"]["gim_roma"]["model"]["name"] == "roma"


@pytest.mark.skipif(not Path("/root/reference/config/app.yaml").exists(),
                    reason="reference not mounted")
def test_webui_zoo_entry_parity():
    """Every reference matcher_zoo entry must exist here under the same
    name and resolve through get_matcher_zoo (VERDICT r1 item 4: 65/65).
    Extra entries beyond the reference are allowed."""
    import yaml

    from imcui_tpu.ui.utils import get_matcher_zoo

    ref = yaml.safe_load(open("/root/reference/config/app.yaml"))
    ours = yaml.safe_load(
        open(Path(__file__).resolve().parent.parent / "config" /
             "app.yaml"))
    ref_names = set(ref["matcher_zoo"])
    our_names = set(ours["matcher_zoo"])
    missing = ref_names - our_names
    assert not missing, f"zoo entries missing vs reference: {sorted(missing)}"

    resolved = get_matcher_zoo(ours["matcher_zoo"])
    for name, entry in ours["matcher_zoo"].items():
        if not entry.get("enable", True):
            continue
        assert name in resolved, name
        conf = resolved[name]
        assert isinstance(conf["matcher"], dict), name
        if not conf.get("dense"):
            assert isinstance(conf.get("feature"), dict), name


def test_every_model_module_loads():
    """dynamic_load must resolve exactly one BaseModel per module for the
    entire tree (catches broken imports / duplicate classes early)."""
    from imcui_tpu.models import extractors, matchers
    from imcui_tpu.utils.base_model import dynamic_load

    for pkg in (extractors, matchers):
        root = Path(pkg.__file__).parent
        for p in sorted(root.glob("*.py")):
            if p.stem == "__init__":
                continue
            cls = dynamic_load(pkg, p.stem)
            assert hasattr(cls, "default_conf"), p.stem
