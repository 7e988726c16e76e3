"""Dataset tooling: COCO->YOLO converter, DOTA tiling, CopyPaste, Tuner.

Reference surfaces: data/converter.py convert_coco, data/split_dota.py,
data/augment.py CopyPaste, engine/tuner.py.
"""

import json

import numpy as np
import pytest


class TestConvertCOCO:
    def test_bbox_and_segment_roundtrip(self, tmp_path):
        from yolo_ad_refine_tpu.data.converter import convert_coco

        coco = {
            "images": [{"id": 1, "file_name": "a.jpg", "height": 100, "width": 200}],
            "annotations": [
                {"image_id": 1, "category_id": 1, "bbox": [20, 10, 40, 30],
                 "iscrowd": 0, "segmentation": [[20, 10, 60, 10, 60, 40, 20, 40]]},
                {"image_id": 1, "category_id": 3, "bbox": [100, 50, 50, 40],
                 "iscrowd": 0, "segmentation": []},
            ],
            "categories": [],
        }
        (tmp_path / "instances_val.json").write_text(json.dumps(coco))
        out = convert_coco(tmp_path, tmp_path / "out", use_segments=True)
        txt = (out / "labels" / "val" / "a.txt").read_text().strip().splitlines()
        assert len(txt) == 2
        seg_row = txt[0].split()
        assert int(seg_row[0]) == 0  # coco id 1 -> class 0
        poly = np.asarray(seg_row[1:], np.float64).reshape(-1, 2)
        assert np.allclose(poly[0], [0.1, 0.1])  # (20/200, 10/100)
        box_row = np.asarray(txt[1].split(), np.float64)
        assert int(box_row[0]) == 2  # coco id 3 -> class 2
        # cx = (100 + 25)/200, cy = (50 + 20)/100
        assert np.allclose(box_row[1:], [0.625, 0.7, 0.25, 0.4])

    def test_merge_multi_segment_connects(self):
        from yolo_ad_refine_tpu.data.converter import merge_multi_segment

        parts = [[0, 0, 10, 0, 10, 10], [20, 10, 30, 10, 30, 20]]
        merged = np.concatenate(merge_multi_segment(parts), axis=0)
        assert merged.shape[1] == 2 and len(merged) >= 6


class TestSplitDOTA:
    def test_windows_cover_image(self):
        from yolo_ad_refine_tpu.data.split_dota import get_windows

        win = get_windows((1500, 2000), crop_sizes=(1024,), gaps=(200,))
        assert (win[:, 2] <= 2000).all() and (win[:, 3] <= 1500).all()
        assert win[:, 0].min() == 0 and win[:, 1].min() == 0
        # windows reach the far corner
        assert win[:, 2].max() == 2000 and win[:, 3].max() == 1500

    def test_tiling_roundtrip(self, tmp_path):
        import cv2

        from yolo_ad_refine_tpu.data.split_dota import split_images_and_labels

        (tmp_path / "images" / "train").mkdir(parents=True)
        (tmp_path / "labels" / "train").mkdir(parents=True)
        img = np.zeros((800, 900, 3), np.uint8)
        cv2.imwrite(str(tmp_path / "images" / "train" / "big.jpg"), img)
        # one box well inside the first 512-window, normalized corners
        corners = np.asarray([100, 100, 200, 100, 200, 180, 100, 180], np.float64)
        norm = corners.copy()
        norm[0::2] /= 900
        norm[1::2] /= 800
        (tmp_path / "labels" / "train" / "big.txt").write_text(
            "1 " + " ".join(f"{c:.6g}" for c in norm) + "\n"
        )
        out = tmp_path / "tiled"
        split_images_and_labels(tmp_path, out, "train", crop_sizes=(512,), gaps=(128,))
        crops = list((out / "images" / "train").glob("*.jpg"))
        assert len(crops) >= 4
        lbls = [p for p in (out / "labels" / "train").glob("*.txt") if p.read_text().strip()]
        assert len(lbls) >= 1
        row = np.asarray(lbls[0].read_text().split(), np.float64)
        assert row[0] == 1 and (row[1:] >= 0).all() and (row[1:] <= 1).all()


class TestCopyPaste:
    def test_flip_paste_adds_instances(self):
        from yolo_ad_refine_tpu.data.augment import copy_paste_flip

        rng = np.random.default_rng(0)
        img = np.zeros((100, 100, 3), np.uint8)
        img[:, :50] = 50  # left half darker
        seg = [np.asarray([[5, 5], [25, 5], [25, 25], [5, 25]], np.float32)]
        cls = np.asarray([2.0], np.float32)
        out, segs, out_cls = copy_paste_flip(img, seg, cls, p=1.0, rng=rng)
        assert len(segs) == 2 and len(out_cls) == 2
        # pasted polygon is the horizontal mirror
        assert np.allclose(segs[1][:, 0], 100 - seg[0][:, 0])
        assert out_cls[1] == 2.0
        # pasted pixels came from the flipped image (right half was 0)
        assert out[10, 80:95].max() == 50

    def test_no_segments_noop(self):
        from yolo_ad_refine_tpu.data.augment import copy_paste_flip

        img = np.zeros((10, 10, 3), np.uint8)
        out, segs, cls = copy_paste_flip(img, [], np.zeros(0), 1.0,
                                         np.random.default_rng(0))
        assert len(segs) == 0


@pytest.mark.slow
class TestTuner:
    def test_mutation_respects_bounds(self, tmp_path):
        from yolo_ad_refine_tpu.engine.tuner import Tuner

        t = Tuner({"project": str(tmp_path), "lr0": 0.01})
        rng = np.random.default_rng(0)
        # seed a fake history, then mutate from it
        t.tune_csv.write_text(
            "fitness," + ",".join(t.space) + "\n"
            + "0.5," + ",".join("0.01" for _ in t.space) + "\n"
        )
        for _ in range(5):
            hyp = t._mutate(rng)
            for k, bounds in t.space.items():
                assert bounds[0] <= hyp[k] <= bounds[1], k


class TestTrackerCallbacks:
    def test_jsonl_tracker_end_to_end(self, tmp_path):
        import json

        from yolo_ad_refine_tpu.utils.callbacks import tracker_callbacks

        hooks = tracker_callbacks("jsonl", str(tmp_path))
        assert set(hooks) == {"on_train_start", "on_fit_epoch_end", "on_train_end"}

        class T:
            args = {"lr0": 0.01, "model": "m.yaml"}
            save_dir = tmp_path
            current_epoch = 0
            last_epoch_scalars = {"train/box_loss": 1.5}

        t = T()
        (tmp_path / "results.csv").write_text("epoch\n")
        hooks["on_train_start"](t)
        hooks["on_fit_epoch_end"](t)
        t.current_epoch = 1
        t.last_epoch_scalars = {"train/box_loss": 1.2}
        hooks["on_fit_epoch_end"](t)
        hooks["on_train_end"](t)
        lines = [json.loads(x) for x in
                 (tmp_path / "metrics.jsonl").read_text().splitlines()]
        assert lines[0]["event"] == "start" and lines[0]["params"]["lr0"] == 0.01
        assert lines[1]["metrics"]["train/box_loss"] == 1.5
        assert lines[-1]["event"] == "end"
        assert any("results.csv" in a for a in lines[-1]["artifacts"])

    def test_sdk_trackers_gate_on_missing_package(self, tmp_path):
        from yolo_ad_refine_tpu.utils.callbacks import TRACKERS, tracker_callbacks

        for name in ("wandb", "comet", "clearml", "dvc", "neptune"):
            assert name in TRACKERS
            assert tracker_callbacks(name, str(tmp_path)) == {}  # not installed
