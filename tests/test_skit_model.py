"""skitG model: style-code path (setup, forward, style sensitivity)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.test_models import synth_batch, tiny_opt
from vts_tpu.models.skit import SKITModel

pytestmark = pytest.mark.slow  # module fixture jit-compiles the CLIP tower (~2.5 min on the 1-core host)


@pytest.fixture(scope="module")
def skit_model_and_batch():
    opt = tiny_opt(model="skit", use_style_code=True, style_code_dim=512,
                   style_code_mode="concat", style_code_mapping_mode="tile",
                   num_layer_style_code=2, precomputed_style_codes=False,
                   clip_weights="", use_vision_aided_loss=False)
    model = SKITModel(opt)
    batch = synth_batch(k=4, seed=0)
    batch["style_image"] = np.random.default_rng(0).uniform(
        -1, 1, (1, 64, 64, 3)).astype(np.float32)
    batch["material_index"] = np.array([0], np.int32)
    model.setup(batch)
    return model, batch


def test_skit_setup_has_style_params(skit_model_and_batch):
    model, _ = skit_model_and_batch
    # the style-concat decoder exists and the G initialized with a style arg
    assert model.clip_params is not None
    assert "G" in model.states


def test_skit_forward_is_style_sensitive(skit_model_and_batch):
    model, batch = skit_model_and_batch
    model.set_input(batch, phase="test")
    assert "style_code" in model._input
    model.test()
    out_a = np.asarray(model._outputs["fake_I"])

    b2 = dict(batch)
    b2["style_image"] = np.random.default_rng(9).uniform(
        -1, 1, (1, 64, 64, 3)).astype(np.float32)
    model.set_input(b2, phase="test")
    model.test()
    out_b = np.asarray(model._outputs["fake_I"])
    assert out_a.shape == out_b.shape
    assert not np.allclose(out_a, out_b), "style code must modulate the output"


def test_skit_precomputed_style_code(skit_model_and_batch):
    model, batch = skit_model_and_batch
    b = dict(batch)
    b.pop("style_image")
    b["style_code"] = np.zeros((1, 512), np.float32)
    model.set_input(b, phase="test")
    model.test()
    assert np.isfinite(np.asarray(model._outputs["fake_I"])).all()
