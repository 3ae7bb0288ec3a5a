"""Property tests for the analytic coordinate transforms.

These invariants are the correctness backbone of the SKIT patch economy:
each image-space augmentation has an exact coordinate-space mirror
(reference data/dataset_util.py:150-239).
"""

import numpy as np
import pytest

from vts_tpu.data.coords import (ROI, crop_roi, crop_window, make_power_2_roi,
                                 make_power_2_size, pack_patch_coords, pad_roi,
                                 patch_offsets, zoom_roi)


def test_zoom_scales_all_fields():
    r = ROI(10, 20, 30, 40)
    out = zoom_roi(r, scale_h=2.0, scale_w=0.5)
    assert out == ROI(5.0, 40.0, 60.0, 20.0)


def test_zoom_identity():
    r = ROI(1, 2, 3, 4)
    assert zoom_roi(r) == r


@pytest.mark.parametrize("seed", range(5))
def test_crop_roundtrip_point_consistency(seed):
    # a point inside the ROI must land at the same relative offset after crop
    rng = np.random.default_rng(seed)
    r = ROI(*rng.uniform(10, 200, size=4))
    rr = rng.uniform(0.5, 2.0)
    cx, cy = rng.uniform(0, 50, size=2)
    valid, out = crop_roi(r, 4000, 4000, rr, cx, cy)
    # relative position of the ROI corner scales by rr and shifts by crop pos
    assert np.isclose(out.x, r.x * rr - cx)
    assert np.isclose(out.y, r.y * rr - cy)
    assert np.isclose(out.h, r.h * rr)
    assert np.isclose(out.w, r.w * rr)


def test_crop_validity_boundaries():
    r = ROI(0, 0, 10, 10)
    valid, _ = crop_roi(r, 100, 100, 1.0, 0, 0)
    assert valid
    # shifting the crop window right of the ROI makes x negative → invalid
    valid, out = crop_roi(r, 100, 100, 1.0, 5, 0)
    assert not valid and out.x == -5
    # ROI overflowing the crop extent → invalid
    r2 = ROI(95, 0, 10, 10)
    valid, _ = crop_roi(r2, 100, 100, 1.0, 0, 0)
    assert not valid


def test_make_power_2():
    h, w, rw, rh = make_power_2_size(1800, 1800, 256)
    assert h == w == 1792
    assert np.isclose(rw, 1792 / 1800) and np.isclose(rh, 1792 / 1800)
    r = make_power_2_roi(ROI(100, 100, 50, 50), rw, rh)
    assert np.isclose(r.x, 100 * rw)
    # identity case
    assert make_power_2_size(512, 512, 256) == (512, 512, 1.0, 1.0)


def test_pad_roi_center_shift():
    r = pad_roi(ROI(0, 0, 5, 5), org_w=1280, org_h=960, padded_size=1800)
    assert r == ROI((1800 - 1280) // 2, (1800 - 960) // 2, 5, 5)


def test_crop_window_center_protection():
    rng = np.random.default_rng(0)
    for _ in range(20):
        x, y = crop_window(1800, 1800, 1536, 1536, center_h=960, center_w=1280, rng=rng)
        # protected center region must fit inside the crop
        cx0 = (1800 - 1280) // 2
        cy0 = (1800 - 960) // 2
        assert x <= cx0 and x + 1536 >= cx0 + 1280
        assert y <= cy0 and y + 1536 >= cy0 + 960


def test_crop_window_center_crop():
    assert crop_window(1800, 1800, 1536, 1536, center_crop=True) == (132, 132)


def test_patch_offsets_matches_reference_formula():
    # offset = round((ROI + crop_pos / rr) * mult), cutout = round(size/rr*mult)
    # (reference models/model_utils.py:23-69)
    coords = np.stack([
        pack_patch_coords(ROI(100.25, 50.75, 64, 64), 32, 1.0, 10.0, 4.0),
        pack_patch_coords(ROI(0, 0, 64, 64), 32, 2.0, 8.0, 4.0),
    ])
    ox, oy, cut = patch_offsets(coords, scale_multiplier=1)
    assert ox.tolist() == [round(100.25 + 10.0), round(0 + 8 / 2)]
    assert oy.tolist() == [round(50.75 + 4.0), round(0 + 4 / 2)]
    assert cut.tolist() == [32, 16]
    ox2, oy2, cut2 = patch_offsets(coords, scale_multiplier=4)
    assert cut2.tolist() == [128, 64]
    assert ox2[0] == round((100.25 + 10.0) * 4)


def test_chained_pipeline_keeps_patch_inside_image():
    """Simulate the full augmentation chain and check the patch window still
    addresses in-bounds pixels — the invariant the training gather relies on."""
    rng = np.random.default_rng(1)
    for _ in range(25):
        base = ROI(400, 500, 64, 64)
        r = pad_roi(base, org_w=1280, org_h=960, padded_size=1800)
        sf = rng.uniform(0.9, 1.1)
        r = zoom_roi(r, sf, sf)
        img = int(round(1800 * sf))
        cx, cy = crop_window(img, img, 1536, 1536, rng=rng)
        valid, r = crop_roi(r, 1536, 1536, 1.0, cx, cy)
        if not valid:
            continue
        nh, nw, rw, rh = make_power_2_size(1536, 1536, 256)
        r = make_power_2_roi(r, rw, rh)
        coords = pack_patch_coords(r, 32, 1.0, 8, 8)[None]
        ox, oy, cut = patch_offsets(coords)
        assert 0 <= ox[0] and ox[0] + cut[0] <= nw + 1
        assert 0 <= oy[0] and oy[0] + cut[0] <= nh + 1
