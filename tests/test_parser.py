"""Yaml model-compiler tests: the full z-yaml zoo must parse with correct
channel bookkeeping (parity with reference parse_model, tasks.py:943)."""

from pathlib import Path

import pytest

from yolo_ad_refine_tpu.models.parser import load_model_cfg, parse_model_yaml
from yolo_ad_refine_tpu.utils import ROOT

REF_ZYAML = Path("/root/reference/z-yaml")
BUNDLED = ROOT / "cfg" / "models"

# yamls referencing modules known to be dead/broken in the reference itself
# (yolo11-HSFPN.yaml names an undefined ChannelAttention_HSFPN -> KeyError there too)
REF_BROKEN = {"yolo11-HSFPN.yaml", "yolo11-HSFPN copy.yaml"}


def _parse(path):
    return parse_model_yaml(load_model_cfg(path))


class TestBundledConfigs:
    def test_yolo11(self):
        specs, meta = _parse(BUNDLED / "yolo11.yaml")
        assert len(specs) == 24
        assert specs[-1].name == "Detect"
        # n-scale widths: 1024 -> 256 at width 0.25
        assert specs[9].c2 == 256  # SPPF out
        assert meta["ch"][-2] == 256

    def test_flagship(self):
        specs, meta = _parse(BUNDLED / "yolo11-701-YOLO-AD-Refine.yaml")
        assert len(specs) == 34
        assert specs[-1].name == "AYHead"
        # head_channel=512 width-scaled to 128 at n
        assert specs[12].c2 == 128  # nn.Conv2d P5_out1
        assert specs[26].c2 == 128  # P3_out
        # ELA keeps channels; Multiply takes first input's channels
        assert specs[11].c2 == specs[10].c2
        assert specs[17].c2 == specs[15].c2
        # head sees (P3, P4, P5) = 128 each
        assert tuple(specs[-1].module.ch) == (128, 128, 128)

    def test_scale_suffix_resolution(self):
        cfg = load_model_cfg(BUNDLED / "yolo11s.yaml")  # resolves yolo11.yaml + scale s
        assert cfg["scale"] == "s"
        specs, meta = parse_model_yaml(cfg)
        assert specs[9].c2 == 512  # width 0.5


@pytest.mark.skipif(not REF_ZYAML.exists(), reason="reference z-yaml not mounted")
class TestReferenceZoo:
    def test_all_zyamls_parse(self):
        """Every shipped z-yaml config must compile (reference test strategy:
        test_all_model_yamls, test_python.py:219)."""
        failures = []
        for y in sorted(REF_ZYAML.glob("*.yaml")):
            if y.name in REF_BROKEN:
                continue
            try:
                specs, meta = _parse(y)
                assert specs[-1].is_head or specs[-1].name in ("Detect", "AYHead")
            except Exception as e:  # noqa: BLE001
                failures.append((y.name, repr(e)))
        assert not failures, failures

    def test_reference_flagship_channels(self):
        specs, meta = _parse(REF_ZYAML / "yolo11-701-YOLO-AD-Refine.yaml")
        bundled_specs, _ = _parse(BUNDLED / "yolo11-701-YOLO-AD-Refine.yaml")
        assert [s.c2 for s in specs] == [s.c2 for s in bundled_specs]
        assert [s.name for s in specs] == [s.name for s in bundled_specs]

    def test_reference_yolo11_matches_bundled(self):
        ref = _parse(Path("/root/reference/ultralytics/cfg/models/11/yolo11.yaml"))[0]
        ours = _parse(BUNDLED / "yolo11.yaml")[0]
        assert [s.c2 for s in ref] == [s.c2 for s in ours]
