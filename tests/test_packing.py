"""Garment-packing equivalence: a pack=G CustomUNet with G garments' params
packed into grouped convs must reproduce each garment's pack=1 forward."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vts_tpu.networks.unet_custom import CustomUNet
from vts_tpu.parallel.packing import (pack_images, pack_tree, unpack_images,
                                      unpack_tree)

NGF = 4
IN_NC = 9
SIZE = 256


def make_single(seed):
    net = CustomUNet(ngf=NGF, num_downs=8, num_layer_separate=4,
                     norm_type="instance", train=True)
    x0 = jnp.zeros((1, SIZE, SIZE, IN_NC))
    params = net.init(jax.random.key(seed), x0)["params"]
    return net, params


@pytest.mark.slow
@pytest.mark.parametrize("g", [2, 3])
def test_packed_forward_matches_per_garment(g):
    net1, _ = make_single(0)
    params_list = [make_single(s)[1] for s in range(g)]
    rng = np.random.default_rng(0)
    xs = [jnp.asarray(rng.uniform(-1, 1, (1, SIZE, SIZE, IN_NC)).astype(np.float32))
          for _ in range(g)]
    refs = [net1.apply({"params": p}, x) for p, x in zip(params_list, xs)]

    netp = CustomUNet(ngf=NGF, num_downs=8, num_layer_separate=4,
                      norm_type="instance", train=True, pack=g)
    stacked = jax.tree_util.tree_map(lambda *l: jnp.stack(l), *params_list)
    packed = pack_tree(stacked)
    # structure parity: packed tree must init-match the pack=G network
    init_packed = netp.init(jax.random.key(9), jnp.zeros((1, SIZE, SIZE, g * IN_NC)))["params"]
    ref_paths = {jax.tree_util.keystr(k): v.shape
                 for k, v in jax.tree_util.tree_flatten_with_path(init_packed)[0]}
    got_paths = {jax.tree_util.keystr(k): v.shape
                 for k, v in jax.tree_util.tree_flatten_with_path(packed)[0]}
    assert ref_paths == got_paths

    out = netp.apply({"params": packed}, pack_images(xs))
    outs = unpack_images(out, g)
    for i, ref in enumerate(refs):
        np.testing.assert_allclose(np.asarray(outs[i]), np.asarray(ref),
                                   rtol=2e-4, atol=2e-5)


def test_pack_unpack_roundtrip():
    params_list = [make_single(s)[1] for s in range(3)]
    stacked = jax.tree_util.tree_map(lambda *l: jnp.stack(l), *params_list)
    packed = pack_tree(stacked)
    back = unpack_tree(packed, 3)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        stacked, back)


@pytest.mark.slow
def test_packed_gradients_stay_per_garment():
    """Gradients through the packed net must not leak across garments: a loss
    on garment 0's output slice has zero gradient on garment 1's kernels."""
    g = 2
    params_list = [make_single(s)[1] for s in range(g)]
    stacked = jax.tree_util.tree_map(lambda *l: jnp.stack(l), *params_list)
    packed = pack_tree(stacked)
    netp = CustomUNet(ngf=NGF, num_downs=8, num_layer_separate=4,
                      norm_type="instance", train=True, pack=g)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.uniform(-1, 1, (1, SIZE, SIZE, g * IN_NC)).astype(np.float32))

    def loss(p):
        out = netp.apply({"params": p}, x)
        return jnp.sum(jnp.abs(unpack_images(out, g)[0]))

    grads = jax.grad(loss)(packed)
    gstack = unpack_tree(grads, g)
    leaves = jax.tree_util.tree_leaves(gstack)
    g0 = max(float(jnp.abs(l[0]).max()) for l in leaves)
    g1 = max(float(jnp.abs(l[1]).max()) for l in leaves)
    assert g0 > 0
    assert g1 == 0.0
