"""Pallas suppression kernel vs. the lax reference implementation."""

import numpy as np
import jax.numpy as jnp


def _random_candidates(rng, k, spread=60.0):
    cxy = rng.uniform(0, 200, (k, 2))
    wh = rng.uniform(4, spread, (k, 2))
    boxes = np.concatenate([cxy - wh / 2, cxy + wh / 2], -1).astype(np.float32)
    scores = np.sort(rng.uniform(0, 1, k).astype(np.float32))[::-1].copy()
    return boxes, scores


class TestSuppressPallas:
    def test_matches_lax_reference(self):
        from yolo_ad_refine_tpu.ops.nms import _suppress
        from yolo_ad_refine_tpu.ops.nms_pallas import suppress_pallas

        rng = np.random.default_rng(0)
        for seed in range(3):
            rng = np.random.default_rng(seed)
            boxes, scores = _random_candidates(rng, 256)
            ref = np.asarray(_suppress(jnp.asarray(boxes), jnp.asarray(scores), 0.45, 0.25))
            got = np.asarray(suppress_pallas(jnp.asarray(boxes), jnp.asarray(scores),
                                             0.45, 0.25, interpret=True))
            np.testing.assert_array_equal(got, ref)
            assert ref.sum() > 0

    def test_unaligned_k_padding(self):
        """K not a multiple of 128 pads with dead candidates."""
        from yolo_ad_refine_tpu.ops.nms import _suppress
        from yolo_ad_refine_tpu.ops.nms_pallas import suppress_pallas

        rng = np.random.default_rng(11)
        boxes, scores = _random_candidates(rng, 200)
        ref = np.asarray(_suppress(jnp.asarray(boxes), jnp.asarray(scores), 0.45, 0.25))
        got = np.asarray(suppress_pallas(jnp.asarray(boxes), jnp.asarray(scores),
                                         0.45, 0.25, interpret=True))
        assert got.shape == (200,)
        np.testing.assert_array_equal(got, ref)

    def test_rotated_matches_lax_reference(self):
        from yolo_ad_refine_tpu.ops.nms import _suppress_rotated
        from yolo_ad_refine_tpu.ops.nms_pallas import suppress_rotated_pallas

        for seed, k in [(0, 256), (1, 200)]:
            rng = np.random.default_rng(seed)
            cxy = rng.uniform(20, 180, (k, 2))
            wh = rng.uniform(10, 50, (k, 2))
            ang = rng.uniform(0, np.pi / 2, (k, 1))
            rb = np.concatenate([cxy, wh, ang], -1).astype(np.float32)
            scores = np.sort(rng.uniform(0, 1, k).astype(np.float32))[::-1].copy()
            ref = np.asarray(_suppress_rotated(jnp.asarray(rb), jnp.asarray(scores),
                                               0.45, 0.25))
            got = np.asarray(suppress_rotated_pallas(jnp.asarray(rb), jnp.asarray(scores),
                                                     0.45, 0.25, interpret=True))
            np.testing.assert_array_equal(got, ref)
            assert 0 < ref.sum() < k

    def test_conf_filter_and_dense_overlap(self):
        from yolo_ad_refine_tpu.ops.nms import _suppress
        from yolo_ad_refine_tpu.ops.nms_pallas import suppress_pallas

        rng = np.random.default_rng(7)
        # heavy overlap: many boxes around few centers, plus sub-threshold tail
        centers = rng.uniform(50, 150, (8, 2))
        cxy = centers[rng.integers(0, 8, 128)] + rng.normal(0, 3, (128, 2))
        wh = rng.uniform(20, 30, (128, 2))
        boxes = np.concatenate([cxy - wh / 2, cxy + wh / 2], -1).astype(np.float32)
        scores = np.sort(rng.uniform(0, 1, 128).astype(np.float32))[::-1].copy()
        scores[96:] = 0.01  # below conf -> never kept, never suppress
        ref = np.asarray(_suppress(jnp.asarray(boxes), jnp.asarray(scores), 0.5, 0.25))
        got = np.asarray(suppress_pallas(jnp.asarray(boxes), jnp.asarray(scores),
                                         0.5, 0.25, interpret=True))
        np.testing.assert_array_equal(got, ref)
        assert not ref[96:].any()
