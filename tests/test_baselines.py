"""Baseline-model step tests (pix2pix / pix2pixHD / SPADE) on tiny patch
batches, plus ImagePool wiring semantics.

Options are built through the real 3-stage CLI composition (TrainOptions) so
every model-specific flag/default is exercised, exactly as a user run would.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vts_tpu.config import TrainOptions
from vts_tpu.models import create_model
from vts_tpu.utils.image_pool import ImagePool, pool_query


def build_opt(model, tmp_path, *extra):
    argv = [
        "--model", model, "--name", f"ut_{model}",
        "--dataroot", "synthetic://ut",
        "--checkpoints_dir", str(tmp_path),
        "--batch_size", "4", "--ngf", "4", "--ndf", "4", "--crop_size", "32",
        "--center_w", "32", "--center_h", "32", "--data_len", "2",
        "--n_epochs", "1", "--n_epochs_decay", "0",
    ] + list(extra)
    return TrainOptions().parse(argv, quiet=True)


def patch_batch(b=4, seed=0):
    r = np.random.default_rng(seed)
    return {
        "S": r.uniform(-1, 1, (b, 32, 32, 1)).astype(np.float32),
        "I": r.uniform(-1, 1, (b, 32, 32, 3)).astype(np.float32),
        "M": np.ones((b, 32, 32, 1), np.float32),
        "T_images": r.uniform(-1, 1, (b, 1, 32, 32, 2)).astype(np.float32),
        "I_masks": np.ones((b, 1, 32, 32, 1), np.float32),
    }


def run_steps(model, batch, n=2):
    model.setup(batch)
    g0 = jax.tree_util.tree_map(np.asarray, model.states["G"].params)
    for i in range(n):
        model.set_input(batch)
        model.optimize_parameters(1)
    losses = model.get_current_losses()
    assert losses and all(np.isfinite(v) for v in losses.values()), losses
    g1 = model.states["G"].params
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()), g0, g1)
    assert max(jax.tree_util.tree_leaves(diffs)) > 0, "G params did not update"
    return losses


@pytest.mark.parametrize("name,extra", [
    ("pix2pix", ()),
    ("pix2pixhd", ("--n_downsample_global", "2", "--n_blocks_global", "2")),
    ("spade", ("--num_upsampling_layers", "3",)),
])
@pytest.mark.slow
def test_baseline_step(name, extra, tmp_path):
    opt = build_opt(name, tmp_path, *extra)
    model = create_model(opt)
    run_steps(model, patch_batch())


def test_pix2pixhd_image_pool_wired(tmp_path):
    """pool_size>0 routes the D1 fake pass through the on-device pool
    (reference pix2pixHD_model.py:582) and the pool fills monotonically."""
    opt = build_opt("pix2pixhd", tmp_path, "--pool_size", "6",
                    "--n_downsample_global", "2", "--n_blocks_global", "2",
                    "--no_vgg_loss")
    model = create_model(opt)
    batch = patch_batch()
    model.setup(batch)
    counts = []
    for i in range(3):
        model.set_input(batch)
        model.optimize_parameters(1)
        counts.append(int(np.asarray(model._pool_state["pool_n"])))
    assert counts == [4, 6, 6]  # 4 inserts, then clamped at pool_size
    losses = model.get_current_losses()
    assert all(np.isfinite(v) for v in losses.values())


def test_create_model_rejects_pool_for_non_hd(tmp_path):
    opt = build_opt("pix2pix", tmp_path, "--pool_size", "50")
    with pytest.raises(ValueError, match="pool_size"):
        create_model(opt)


def test_pool_query_semantics():
    """Jit-side pool: pure insert phase returns identity; once full, every
    returned sample is either the input or a historical buffer entry, and the
    fill count stays clamped."""
    P, B = 6, 4
    buf = jnp.zeros((P, 2, 2, 1))
    n = jnp.int32(0)
    imgs1 = jnp.arange(B * 4, dtype=jnp.float32).reshape(B, 2, 2, 1) + 1.0
    buf, n, out = jax.jit(pool_query)(buf, n, imgs1, jax.random.key(0))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(imgs1))
    assert int(n) == 4
    buf_before = np.asarray(buf).copy()
    imgs2 = -(jnp.arange(B * 4, dtype=jnp.float32).reshape(B, 2, 2, 1) + 1.0)
    buf, n, out = jax.jit(pool_query)(buf, n, imgs2, jax.random.key(1))
    assert int(n) == P
    out = np.asarray(out)
    candidates = np.concatenate([buf_before, np.asarray(imgs2)], axis=0)
    for sample in out:
        assert any(np.array_equal(sample, c) for c in candidates)
    # host-side reference behaves the same way in the insert phase
    host = ImagePool(pool_size=P, seed=0)
    np.testing.assert_array_equal(host.query(np.asarray(imgs1)),
                                  np.asarray(imgs1))


def test_best_vote_floor_tiebreak():
    """Reference train.py:190 uses counter >= total//2: with 7 metrics,
    3 improvements already save 'best'."""
    from vts_tpu.train import best_vote
    best = {f"metric_I_m{i}_LPIPS": 1.0 for i in range(7)}
    metrics = dict(best)
    for i in range(3):
        metrics[f"metric_I_m{i}_LPIPS"] = 0.5   # 3 of 7 improve
    assert best_vote(metrics, best)
    metrics = dict(best)
    for i in range(2):
        metrics[f"metric_I_m{i}_LPIPS"] = 0.5   # 2 of 7 is not enough
    assert not best_vote(metrics, best)


def test_baseline_chunk_dispatch_degrades_to_per_step(tmp_path):
    """Baselines inherit optimize_parameters_chunk but never build the scan
    machinery (supports_chunk is set only by SinSKITModel.__init__) — a
    --steps_per_dispatch>1 run must degrade to per-step dispatch, not crash."""
    import jax.numpy as jnp

    opt = build_opt("pix2pix", tmp_path)
    model = create_model(opt)
    assert not getattr(model, "supports_chunk", False)
    batch = patch_batch()
    model.setup(batch)
    model.set_input(batch)
    stacked = {k: jnp.stack([jnp.asarray(v), jnp.asarray(v)])
               for k, v in model._input.items()}
    k = model.optimize_parameters_chunk(stacked, epoch=1)
    assert k == 2
    losses = model.get_current_losses()
    assert losses and all(np.isfinite(v) for v in losses.values())


def test_spade_image_pool_wired(tmp_path):
    """spade carries the pool state too (reference spade_model.py:333) —
    the round-3 review found _train_step dropped pool_out from its outputs."""
    opt = build_opt("spade", tmp_path, "--pool_size", "6",
                    "--num_upsampling_layers", "3", "--no_vgg_loss")
    model = create_model(opt)
    batch = patch_batch()
    model.setup(batch)
    counts = []
    for i in range(3):
        model.set_input(batch)
        model.optimize_parameters(1)
        counts.append(int(np.asarray(model._pool_state["pool_n"])))
    assert counts == [4, 6, 6]
    losses = model.get_current_losses()
    assert all(np.isfinite(v) for v in losses.values())
