"""Data-layer tests: synthetic garment generation, the SingleSkit pipeline's
static-shape contract, and — the load-bearing one — vision↔touch coordinate
alignment through the full augmentation chain (the assertion version of the
reference's save_compare_vision_touch_plot debug fixture,
reference data/singleskit_dataset.py:910-996)."""

import types

import jax.numpy as jnp
import numpy as np
import pytest

from vts_tpu.data import DataLoader, collate, create_dataset
from vts_tpu.data.singleskit import SingleSkitDataset, pack_aug_params, unpack_aug_params
from vts_tpu.ops.patch import gather_patches_from_coords


def make_opt(**kw):
    base = dict(
        dataroot="synthetic://aligntest?size=320&center_w=192&center_h=128&patches=6&val_patches=3",
        subdir_S="trainS", subdir_I="trainI", subdir_T="trainT", subdir_M="trainM",
        subdir_valT="valT", isTrain=True, data_len=2, preprocess="crop",
        crop_size=256, center_w=192, center_h=128, batch_size_G2=16,
        batch_size_G2_val=24, T_resolution_multiplier=1, sample_bbox_per_patch=2,
        w_resampling=True, resampling_w_min=1, resampling_w_max=10,
        use_bg_mask=True, sketch_nc=1, seed=0, cache_dir="", random_scale_max=3.0,
        batch_size=1, serial_batches=False, num_threads=0, max_dataset_size=None,
        dataset_mode="singleskit",
    )
    base.update(kw)
    return types.SimpleNamespace(**base)


@pytest.fixture(scope="module")
def dataset():
    return SingleSkitDataset(make_opt())


def test_static_shapes(dataset):
    s0 = dataset[0]
    s1 = dataset[1]
    for key in ("S", "I", "M", "T_images", "T_coords", "I_masks", "T_valid",
                "val_T_images", "val_T_coords", "val_I_masks", "val_T_valid"):
        assert s0[key].shape == s1[key].shape, key
    assert s0["T_images"].shape == (16, 32, 32, 2)
    assert s0["T_coords"].shape == (16, 8)
    assert s0["I_masks"].shape == (16, 32, 32, 1)
    assert s0["S"].shape == (256, 256, 1)
    assert s0["T_valid"].sum() == 16  # synthetic garment always fills the budget


def test_value_ranges(dataset):
    s = dataset[0]
    assert -1.0 <= s["S"].min() and s["S"].max() <= 1.0
    assert -1.0 <= s["I"].min() and s["I"].max() <= 1.0
    assert set(np.unique(s["M"])) <= {0.0, 1.0}
    assert np.abs(s["T_images"]).max() <= 1.0 + 1e-5
    assert set(np.unique(s["I_masks"])) <= {0.0, 1.0}


def test_cache_roundtrip(dataset):
    a = dataset[0]          # builds + writes cache
    b = dataset[0]          # reads cache
    for k in a:
        np.testing.assert_array_equal(a[k], b[k], err_msg=k)


def test_deterministic_given_seed():
    d1 = SingleSkitDataset(make_opt(cache_dir="/tmp/vts_cache_det1"))
    d2 = SingleSkitDataset(make_opt(cache_dir="/tmp/vts_cache_det2"))
    a, b = d1.build_sample(0), d2.build_sample(0)
    for k in a:
        np.testing.assert_array_equal(a[k], b[k], err_msg=k)


def test_vision_touch_alignment(dataset):
    """The synthetic garment's visual shade is an affine map of the height
    field whose gradient is the tactile gx/gy.  If the packed coordinates are
    right, the luminance x-gradient of the visual patch gathered at T_coords
    must correlate strongly with the stored gx patch."""
    s = dataset[0]
    I = jnp.asarray(s["I"][None])
    patches = np.asarray(gather_patches_from_coords(I, jnp.asarray(s["T_coords"]), patch_size=32))
    corr_list = []
    for k in range(patches.shape[0]):
        lum = patches[k].mean(axis=-1)
        gx_from_I = np.gradient(lum, axis=1)
        gx_true = s["T_images"][k, :, :, 0]
        # compare inside the contact∧object mask — outside it the visual is
        # background and the affine shade↔height relation doesn't hold
        m = s["I_masks"][k, :, :, 0] > 0
        if m.sum() < 32:
            continue
        c = np.corrcoef(gx_from_I[m].ravel(), gx_true[m].ravel())[0, 1]
        corr_list.append(c)
    # strongly correlated — misaligned coords give ~0 correlation (patches at
    # the mask boundary suffer resampling bleed, hence the loose per-patch floor)
    assert np.mean(corr_list) > 0.85, corr_list
    assert min(corr_list) > 0.25, corr_list


def test_aug_params_roundtrip():
    aug = {k: float(i) for i, k in enumerate(
        ("H", "W", "crop_pos_x", "crop_pos_y", "crop_size_h", "crop_size_w",
         "patch_crop_size", "resize_ratio", "resize_ratio_h", "resize_ratio_w",
         "scale_factor_h", "scale_factor_w"))}
    assert unpack_aug_params(pack_aug_params(aug)) == aug


def test_dataloader_epoch_shuffle_and_collate(dataset):
    loader = DataLoader(dataset, batch_size=2, shuffle=True, seed=0)
    loader.set_epoch(0)
    b = next(iter(loader))
    assert b["S"].shape == (2, 256, 256, 1)
    assert b["T_images"].shape == (2, 16, 32, 32, 2)
    # epoch changes the order deterministically
    o0 = loader._order().tolist()
    loader.set_epoch(1)
    o1 = loader._order().tolist()
    loader.set_epoch(0)
    assert loader._order().tolist() == o0
    assert sorted(o1) == sorted(o0)


def test_dataloader_device_cache(dataset):
    """--cache_data_device: second epoch returns the SAME device-resident
    batch objects (no host rebuild/transfer), values identical."""
    import jax
    loader = DataLoader(dataset, batch_size=1, shuffle=True, seed=0,
                        cache_on_device=True)
    loader.set_epoch(0)
    first = {}
    for i, b in enumerate(loader):
        assert isinstance(b["S"], jax.Array)
        first[int(np.asarray(b["sample_idx"]).ravel()[0])] = b["S"]
    loader.set_epoch(1)  # different order, same samples
    for b in loader:
        k = int(np.asarray(b["sample_idx"]).ravel()[0])
        assert b["S"] is first[k]  # cache hit: identical object


def test_dataloader_device_cache_batched_is_bounded(dataset):
    """batch_size>1 + shuffle: the device cache is keyed per SAMPLE, so its
    size is bounded by the dataset (round-3 review: per-batch-tuple keying
    leaked a fresh full batch per epoch), and batches equal the uncached
    loader's."""
    import jax
    n = len(dataset)
    plain = DataLoader(dataset, batch_size=2, shuffle=True, seed=0)
    cached = DataLoader(dataset, batch_size=2, shuffle=True, seed=0,
                        cache_on_device=True)
    for epoch in (0, 1, 2):
        plain.set_epoch(epoch)
        cached.set_epoch(epoch)
        for bp, bc in zip(plain, cached):
            assert isinstance(bc["S"], jax.Array)
            np.testing.assert_array_equal(np.asarray(bc["S"]),
                                          np.asarray(bp["S"]))
            np.testing.assert_array_equal(
                np.asarray(bc["sample_idx"]).ravel(),
                np.asarray(bp["sample_idx"]).ravel())
        assert len(cached._dev_cache) <= n
    assert len(cached._dev_cache) == n


def test_test_phase_center_crop():
    opt = make_opt(isTrain=False, data_len=1, preprocess="none",
                   subdir_S="testS", subdir_I="testI", subdir_T="testT",
                   subdir_M="testM", subdir_valT="")
    ds = SingleSkitDataset(opt)
    a = ds.build_sample(0)
    b = ds.build_sample(0)
    np.testing.assert_array_equal(a["S"], b["S"])  # deterministic center crop
    np.testing.assert_array_equal(a["T_coords"], b["T_coords"])


def test_t_resolution_multiplier_2():
    """x2 tactile resolution: patches are 64², coords stay in visual units,
    and the gathered x2 patch aligns with the stored one."""
    opt = make_opt(
        dataroot="synthetic://multx2?size=320&center_w=192&center_h=128&patches=6&val_patches=3&mult=2",
        T_resolution_multiplier=2, cache_dir="/tmp/vts_cache_x2")
    ds = SingleSkitDataset(opt)
    s = ds.build_sample(0)
    assert s["T_images"].shape == (16, 64, 64, 2)
    assert s["I_masks"].shape == (16, 64, 64, 1)
    if s["T_valid"].sum() == 0:
        pytest.skip("no valid patches for this crop")
    # gathered visual patch at x1 coords must align with the x2 tactile patch
    I = jnp.asarray(s["I"][None])
    p1 = np.asarray(gather_patches_from_coords(I, jnp.asarray(s["T_coords"][:4]),
                                               patch_size=32, scale_multiplier=1))
    gx = s["T_images"][:4, :, :, 0]
    corr = []
    for k in range(4):
        if s["T_valid"][k] == 0:
            continue
        lum = p1[k].mean(axis=-1)
        gx_lowres = gx[k][::2, ::2]
        m = s["I_masks"][k, ::2, ::2, 0] > 0
        if m.sum() < 64:
            continue
        c = np.corrcoef(np.gradient(lum, axis=1)[m], (gx_lowres / 2.0)[m])[0, 1]
        corr.append(c)
    assert corr and np.mean(corr) > 0.5, corr
