"""Native C++ library parity tests vs the NumPy twins."""

import numpy as np
import pytest

from ttdg_mgm_tpu.utils import native
from ttdg_mgm_tpu.utils.rle import rle_encode, rle_decode, _decode_counts_string
from ttdg_mgm_tpu.ops.mask_paste import paste_masks_np
from ttdg_mgm_tpu.evaluation.dice import dice_coefficient

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library unavailable")


class TestNativeParity:
    def test_rle_decode_matches_numpy(self):
        rng = np.random.RandomState(0)
        m = (rng.rand(33, 27) > 0.5).astype(np.uint8)
        counts = _decode_counts_string(rle_encode(m)["counts"])
        out = native.rle_decode_counts(counts, 33, 27)
        np.testing.assert_array_equal(out, m)

    def test_rle_encode_roundtrip(self):
        rng = np.random.RandomState(1)
        m = (rng.rand(17, 19) > 0.7).astype(np.uint8)
        counts = native.rle_encode_counts(m)
        back = rle_decode({"size": [17, 19], "counts": counts})
        np.testing.assert_array_equal(back, m)

    def test_paste_matches_numpy(self):
        rng = np.random.RandomState(2)
        masks = rng.rand(3, 14, 14).astype(np.float32)
        boxes = np.array(
            [[2.3, 3.1, 20.8, 25.9], [0, 0, 31, 31], [-4, -4, 10, 10]],
            np.float32,
        )
        a = native.paste_masks_native(masks, boxes, 32, 32)
        b = paste_masks_np(masks, boxes, 32, 32)
        np.testing.assert_array_equal(a, b)

    def test_dice_matches_numpy(self):
        rng = np.random.RandomState(3)
        a = rng.rand(40, 40) > 0.5
        b = rng.rand(40, 40) > 0.5
        assert abs(native.dice_native(a, b) - dice_coefficient(a, b)) < 1e-9
