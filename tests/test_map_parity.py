"""mAP pipeline parity vs the torch reference's metric stack.

Complements tests/test_e2e_parity.py (box-level detection parity): here the
SAME synthetic detection outcomes go through our ap_per_class/DetMetrics and
the reference's ultralytics.utils.metrics.ap_per_class (reference
metrics.py:1144-1232), and mAP50 / mAP50-95 / P / R must agree to float
precision. Together the two tests give the BASELINE.json north star:
identical boxes -> identical TP matrices -> identical mAP.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

REF = Path("/root/reference")


def _synthetic_eval(seed=0, n_img=16, nc=7, max_gt=12):
    """Build a plausible detection-evaluation outcome: per-prediction
    10-threshold TP flags, confidences, predicted and target classes."""
    r = np.random.default_rng(seed)
    tps, confs, pcls, tcls = [], [], [], []
    for _ in range(n_img):
        n_gt = int(r.integers(1, max_gt))
        cls_gt = r.integers(0, nc, n_gt)
        tcls.append(cls_gt)
        # detections: most GTs found with varying localization quality
        for c in cls_gt:
            if r.random() < 0.85:
                quality = r.random()
                tp = (np.linspace(0.5, 0.95, 10) <= 0.5 + 0.45 * quality)
                tps.append(tp)
                confs.append(0.2 + 0.8 * quality * r.random())
                pcls.append(c if r.random() < 0.92 else r.integers(0, nc))
        # false positives
        for _ in range(int(r.integers(0, 4))):
            tps.append(np.zeros(10, bool))
            confs.append(r.random() * 0.6)
            pcls.append(r.integers(0, nc))
    return (np.stack(tps), np.asarray(confs), np.asarray(pcls),
            np.concatenate(tcls))


@pytest.mark.skipif(not REF.exists(), reason="reference not mounted")
@pytest.mark.parametrize("seed", [0, 7])
@pytest.mark.slow
def test_map_matches_reference_metrics(seed):
    sys.path.insert(0, str(Path(__file__).parent))
    from test_parity import _ensure_reference_importable

    _ensure_reference_importable()
    from ultralytics.utils.metrics import ap_per_class as ref_ap

    from yolo_ad_refine_tpu.utils.metrics import ap_per_class as our_ap

    tp, conf, pcls, tcls = _synthetic_eval(seed)
    ours = our_ap(tp, conf, pcls, tcls)

    # the reference validator hands numpy arrays to ap_per_class
    # (reference detect/val.py get_stats: .cpu().numpy())
    ref_out = ref_ap(tp, conf, pcls, tcls, plot=False)
    # reference returns (tp, fp, p, r, f1, ap, unique_classes, p_curve,
    # r_curve, f1_curve, x, prec_values) — reference metrics.py:1226-1232
    ref_p, ref_r, ref_ap_ = (np.asarray(v) for v in
                             (ref_out[2], ref_out[3], ref_out[5]))

    np.testing.assert_allclose(ours["p"], ref_p, atol=1e-10)
    np.testing.assert_allclose(ours["r"], ref_r, atol=1e-10)
    np.testing.assert_allclose(ours["ap"], ref_ap_, atol=1e-10)
    # headline numbers
    np.testing.assert_allclose(ours["ap"][:, 0].mean(), ref_ap_[:, 0].mean(),
                               atol=1e-12)  # mAP50
    np.testing.assert_allclose(ours["ap"].mean(), ref_ap_.mean(),
                               atol=1e-12)  # mAP50-95
