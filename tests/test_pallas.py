"""Pallas kernel parity (interpret mode — CPU-safe)."""

import jax
import jax.numpy as jnp
import numpy as np

from vts_tpu.ops.pallas_gather import gather_patches_pallas
from vts_tpu.ops.patch import gather_patches


def test_pallas_gather_matches_xla_slice():
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.normal(size=(128, 128, 5)).astype(np.float32))
    ox = jnp.asarray(np.array([0, 10, 60, 96], np.int32))
    oy = jnp.asarray(np.array([5, 0, 20, 90], np.int32))
    a = gather_patches_pallas(img, ox, oy, 32, interpret=True)
    b = gather_patches(img, ox, oy, 32, mode="slice")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_pallas_gather_clamps_oob():
    img = jnp.arange(16.0 * 16 * 2).reshape(16, 16, 2)
    a = gather_patches_pallas(img, jnp.array([100], jnp.int32),
                              jnp.array([100], jnp.int32), 8, interpret=True)
    b = gather_patches(img, jnp.array([100], jnp.int32),
                       jnp.array([100], jnp.int32), 8, mode="slice")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def _xla_conv3x3(x, w, b, relu=True):
    y = jax.lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    y = y + b.astype(y.dtype)
    return jnp.maximum(y, 0.0).astype(x.dtype) if relu else y.astype(x.dtype)


def test_pallas_conv3x3_matches_xla():
    """Fused conv+bias+relu kernel: values vs lax.conv at both LPIPS channel
    profiles (64→128, 128→128), f32."""
    from vts_tpu.ops.pallas_conv import conv3x3_relu
    rng = np.random.default_rng(1)
    for cin, cout in ((64, 128), (128, 128)):
        x = jnp.asarray(rng.normal(size=(2, 16, 24, cin)).astype(np.float32))
        w = jnp.asarray(
            rng.normal(size=(3, 3, cin, cout)).astype(np.float32) * 0.1)
        b = jnp.asarray(rng.normal(size=(cout,)).astype(np.float32))
        for relu in (True, False):
            got = conv3x3_relu(x, w, b, relu=relu, th=8, interpret=True)
            want = _xla_conv3x3(x, w, b, relu=relu)
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       rtol=1e-5, atol=1e-5,
                                       err_msg=f"{cin}->{cout} relu={relu}")


def test_pallas_conv3x3_gradients_match():
    """dx (the Pallas bwd kernel) AND dw/db (the XLA completeness path) match
    the lax.conv VJP — so the op is a correct general conv under AD, while
    frozen-weight training only ever materializes dx."""
    from vts_tpu.ops.pallas_conv import conv3x3_relu
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(1, 16, 16, 64)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, 64, 128)).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.normal(size=(128,)).astype(np.float32))

    def loss_p(x, w, b):
        return jnp.sum(conv3x3_relu(x, w, b, th=8, interpret=True) ** 2)

    def loss_x(x, w, b):
        return jnp.sum(_xla_conv3x3(x, w, b) ** 2)

    gp = jax.grad(loss_p, argnums=(0, 1, 2))(x, w, b)
    gx = jax.grad(loss_x, argnums=(0, 1, 2))(x, w, b)
    for a, c, name in zip(gp, gx, "x w b".split()):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   rtol=2e-4, atol=2e-4, err_msg=name)
