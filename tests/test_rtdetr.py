"""RT-DETR tests: build, forward contracts, param parity vs torch reference."""

from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.slow  # compile-heavy: run with --slow (quick tier excludes)

REF = Path("/root/reference")
CFG = REF / "ultralytics/cfg/models/rt-detr/rtdetr-l.yaml"


@pytest.fixture(scope="module")
def model():
    from yolo_ad_refine_tpu.models.model import DetectionModel

    m = DetectionModel(str(CFG))
    m.init(imgsz=128)
    return m


@pytest.mark.skipif(not CFG.exists(), reason="reference not mounted")
class TestRTDETR:
    def test_forward_contracts(self, model):
        x = jnp.zeros((1, 128, 128, 3))
        y, raw = model(x, train=False)
        assert y.shape == (1, 300, 4 + 80)
        # boxes normalized [0,1]; scores sigmoided
        assert float(y[..., :4].min()) >= 0 and float(y[..., :4].max()) <= 1
        assert float(y[..., 4:].min()) >= 0 and float(y[..., 4:].max()) <= 1
        dec_b, dec_s, enc_b, enc_s = model(x, train=True)
        assert dec_b.shape == (6, 1, 300, 4)
        assert dec_s.shape == (6, 1, 300, 80)
        assert enc_b.shape == (1, 300, 4)

    def test_param_parity(self, model):
        import sys

        sys.path.insert(0, str(Path(__file__).parent))
        from test_parity import _build_torch_reference

        tm = _build_torch_reference(str(CFG))
        ref_n = sum(p.numel() for p in tm.parameters())
        our_n = model.num_params()
        assert our_n == ref_n, f"ours {our_n} vs torch {ref_n}"

    def test_msda_uniform_weights_average(self):
        """With uniform attention weights and zero offsets, MSDA output equals
        the bilinear sample at the reference point averaged over levels."""
        from yolo_ad_refine_tpu.nn.transformer import ms_deformable_attention

        r = np.random.default_rng(0)
        shapes = [(8, 8), (4, 4)]
        v = jnp.asarray(r.normal(size=(1, 80, 2, 4)).astype(np.float32))
        q, nh, nl, npts = 3, 2, 2, 1
        loc = jnp.full((1, q, nh, nl, npts, 2), 0.5)  # center of each map
        w = jnp.full((1, q, nh, nl, npts), 1.0 / (nl * npts))
        out = np.asarray(ms_deformable_attention(v, shapes, loc, w))
        assert out.shape == (1, q, nh * 4)
        # center of an 8x8 map with half-pixel convention = average of 4 centers
        v0 = np.asarray(v[:, :64]).reshape(1, 8, 8, 2, 4)
        center = v0[:, 3:5, 3:5].mean((1, 2))  # (1, 2, 4)
        v1 = np.asarray(v[:, 64:]).reshape(1, 4, 4, 2, 4)
        center1 = v1[:, 1:3, 1:3].mean((1, 2))
        expect = (center + center1) / 2
        np.testing.assert_allclose(out[0, 0], expect.reshape(-1), atol=1e-5)
