"""Fleet-parallelism tests on the virtual 8-device CPU mesh.

The strong property: a vmapped+sharded fleet step over G garments produces
the SAME states/losses as G independent single-garment steps with the same
rngs — garment parallelism is semantically invisible.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.test_models import synth_batch, tiny_opt
from vts_tpu.models.sinskit import SinSKITModel
from vts_tpu.parallel.fleet import FleetTrainer, stack_batches, stack_states, unstack_state
from vts_tpu.parallel.mesh import build_mesh, factor_devices, parse_mesh_spec


def test_mesh_spec_parsing():
    assert parse_mesh_spec("garment:4,data:2") == {"garment": 4, "data": 2}
    assert parse_mesh_spec("") == {}
    with pytest.raises(ValueError):
        parse_mesh_spec("bogus:2")
    assert factor_devices(8) == (4, 2)
    assert factor_devices(7) == (7, 1)
    assert factor_devices(2) == (2, 1)


def test_build_mesh_axes():
    mesh = build_mesh("garment:4,data:2")
    assert mesh.axis_names == ("garment", "data")
    assert mesh.devices.shape == (4, 2)
    mesh1 = build_mesh("")
    assert mesh1.devices.size == len(jax.devices())


@pytest.mark.slow
def test_fleet_step_matches_individual_steps():
    opt = tiny_opt(batch_size_G2=4)
    model = SinSKITModel(opt)
    n_garments = 2
    batches = [synth_batch(k=4, seed=10 + g) for g in range(n_garments)]
    mesh = build_mesh(f"garment:{n_garments}")
    trainer = FleetTrainer(model, mesh, num_garments=n_garments)
    states = trainer.init_states(batches[0], seeds=[0, 1])

    # keep host copies of the initial per-garment states (fleet step donates)
    init_copies = {
        k: [jax.tree_util.tree_map(lambda x: jnp.asarray(np.asarray(x)),
                                   unstack_state(v, g))
            for g in range(n_garments)]
        for k, v in states.items()
    }

    per_g_inputs = []
    for b in batches:
        model.set_input(b)
        per_g_inputs.append({k: np.asarray(v) for k, v in model._input.items()})
    batch = stack_batches(per_g_inputs)
    rngs = jax.random.split(jax.random.key(42), n_garments)

    gS, dS, d2S, fleet_losses, _ = trainer.step(
        states["G"], states["D"], states["D2"], batch, rngs, 1e-3, 5e-4, 1)

    # reference: run each garment individually through the plain jitted step
    step = jax.jit(model._train_step)
    for g in range(n_garments):
        gi, di, d2i, losses_i, _ = step(
            init_copies["G"][g], init_copies["D"][g], init_copies["D2"][g],
            {k: jnp.asarray(v[g]) for k, v in batch.items()},
            rngs[g], jnp.float32(1e-3), jnp.float32(5e-4), jnp.int32(1))
        for k, v in losses_i.items():
            # rtol absorbs the Adam sign-flip cascade (D params differ by
            # O(lr) before the G losses are evaluated); real divergence
            # (wrong garment/rng routing) shows up at O(1)
            np.testing.assert_allclose(np.asarray(fleet_losses[k])[g],
                                       np.asarray(v), rtol=1e-2, atol=1e-4,
                                       err_msg=f"loss {k} garment {g}")
        got = unstack_state(gS, g).params
        diffs = jax.tree_util.tree_map(
            lambda a, b: float(np.max(np.abs(np.asarray(a) - np.asarray(b)))),
            got, gi.params)
        # Adam's step-1 update is lr·ĝ/|ĝ| = ±lr for EVERY element with a
        # nonzero gradient, so any float-reassociation difference between the
        # vmapped and single conv kernels shows up as an O(lr) param delta —
        # a sign test, not a divergence test.  Equivalence is asserted at the
        # loss level above; here only the Adam step-size bound.
        leaf_diffs = np.asarray(jax.tree_util.tree_leaves(diffs))
        assert leaf_diffs.max() <= 2.2 * 1e-3


@pytest.mark.slow
def test_fleet_garments_are_independent():
    """Changing garment 1's data must not affect garment 0's update."""
    opt = tiny_opt(batch_size_G2=4)
    model = SinSKITModel(opt)
    mesh = build_mesh("garment:2")
    trainer = FleetTrainer(model, mesh, num_garments=2)

    def run(seed_b):
        states = trainer.init_states(synth_batch(k=4, seed=0), seeds=[0, 1])
        per_g = []
        for s in (0, seed_b):
            model.set_input(synth_batch(k=4, seed=s))
            per_g.append({k: np.asarray(v) for k, v in model._input.items()})
        batch = stack_batches(per_g)
        rngs = jax.random.split(jax.random.key(7), 2)
        gS, *_ = trainer.step(states["G"], states["D"], states["D2"],
                              batch, rngs, 1e-3, 5e-4, 1)
        return unstack_state(gS, 0).params

    p_a = run(seed_b=100)
    p_b = run(seed_b=200)
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(np.max(np.abs(np.asarray(a) - np.asarray(b)))), p_a, p_b)
    assert max(jax.tree_util.tree_leaves(diffs)) == 0.0


def test_spatial_sharding_conv_equivalence():
    """Sharding the image H axis over a 'spatial' mesh axis must not change
    the generator output — XLA SPMD inserts conv halo exchanges (the SP
    analogue for the 1536²-3072² canvases, SURVEY.md §2.B)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    opt = tiny_opt()
    model = SinSKITModel(opt)
    b = synth_batch(k=4, seed=3)
    model.setup(b)
    S = jnp.asarray(b["S"])
    M = jnp.asarray(b["M"])
    g_vars = model.states["G"].variables()

    ref_I, ref_T = jax.jit(model._forward_eval)(g_vars, S, M, M)

    mesh = build_mesh("spatial:4")
    xshard = NamedSharding(mesh, P(None, "spatial", None, None))
    S_sh = jax.device_put(S, xshard)
    M_sh = jax.device_put(M, xshard)
    with mesh:
        out_I, out_T = jax.jit(model._forward_eval)(g_vars, S_sh, M_sh, M_sh)
    np.testing.assert_allclose(np.asarray(out_I), np.asarray(ref_I),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_T), np.asarray(ref_T),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_batch_dp2_step_equivalence():
    """Wave-3 fleet layout: one garment's batch-4 fused step data-parallel
    over a 'data:2' mesh (2 samples per device) must reproduce the
    single-device batch-4 step — same losses, same parameter update.  The
    training math is IDENTICAL to the quality-validated single-chip batch-4
    configuration (GSPMD partitions the same program; gradients all-reduce
    over 'data'), so running the 20-garment catalog's last 8+8+4 wave as 4
    garments × 2 chips changes wall-clock only, never the training
    trajectory.  (The reference pins one garment per GPU and idles the rest,
    experiments/tmux_launcher.py:87-125.)"""
    import functools
    from jax.sharding import NamedSharding, PartitionSpec as P

    opt = tiny_opt(batch_size=4, use_more_fakeT=True, use_diffaug=True,
                   add_fake_T_sample_size=4)
    model = SinSKITModel(opt)
    parts = [synth_batch(k=4, seed=30 + i) for i in range(4)]
    raw = {k: np.concatenate([b[k] for b in parts], axis=0) for k in parts[0]}
    model.setup(raw)
    model.set_input(raw)
    batch = {k: jnp.asarray(np.asarray(v)) for k, v in model._input.items()}
    init = {k: jax.tree_util.tree_map(
                lambda x: jnp.asarray(np.asarray(x)), model.states[k])
            for k in ("G", "D", "D2")}

    step = jax.jit(functools.partial(model._train_step, use_d3=False))
    rng = jax.random.key(11)
    sargs = (jnp.float32(1e-3), jnp.float32(5e-4), jnp.int32(1))
    gR, dR, d2R, losses_ref, _ = step(init["G"], init["D"], init["D2"],
                                      batch, rng, *sargs)
    losses_ref = {k: np.asarray(v) for k, v in losses_ref.items()}
    gR_host = jax.tree_util.tree_map(np.asarray, gR.params)

    mesh = build_mesh("data:2")
    dp = NamedSharding(mesh, P("data"))      # axis 0 = the sample axis
    rep = NamedSharding(mesh, P())
    batch_dp = {k: jax.device_put(v, dp) for k, v in batch.items()}
    init_dp = {k: jax.device_put(
                   jax.tree_util.tree_map(np.asarray, init[k]), rep)
               for k in init}
    with mesh:
        gD, dD, d2D, losses_dp, _ = step(
            init_dp["G"], init_dp["D"], init_dp["D2"], batch_dp,
            jax.device_put(rng, rep), *sargs)
    for k, v in losses_dp.items():
        # rtol absorbs the partitioned-reduction reassociation (grad psums
        # over 'data'); real divergence (dropped shard, wrong rng fold)
        # shows up at O(1)
        np.testing.assert_allclose(np.asarray(v), losses_ref[k],
                                   rtol=1e-2, atol=1e-4,
                                   err_msg=f"dp2≢serial on loss {k}")
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(np.max(np.abs(np.asarray(a) - np.asarray(b)))),
        gD.params, gR_host)
    # Adam step-1 moves every touched element by ±lr, so reassociation can
    # flip near-zero gradient signs: bound by the Adam step size (the same
    # argument as test_fleet_step_matches_individual_steps)
    assert max(jax.tree_util.tree_leaves(diffs)) <= 2.2e-3


@pytest.mark.slow
def test_channel_sharding_tp_equivalence():
    """Tensor-parallel claim (PARITY.md §2.B): conv kernels CAN shard on the
    output-channel dim over a mesh axis without changing the forward — XLA
    SPMD inserts the collectives. Demonstrated on the generator with its
    4-dim kernels partitioned over a 4-way axis."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    opt = tiny_opt(ngf=8)
    model = SinSKITModel(opt)
    b = synth_batch(k=4, seed=5)
    model.setup(b)
    S = jnp.asarray(b["S"])
    M = jnp.asarray(b["M"])
    g_vars = model.states["G"].variables()

    ref_I, ref_T = jax.jit(model._forward_eval)(g_vars, S, M, M)

    mesh = build_mesh("data:4")  # reuse an existing axis name as the TP axis
    repl = NamedSharding(mesh, P())
    tp = NamedSharding(mesh, P(None, None, None, "data"))

    def shard_leaf(x):
        if getattr(x, "ndim", 0) == 4 and x.shape[-1] % 4 == 0:
            return jax.device_put(x, tp)   # (kh, kw, cin, cout) over cout
        return jax.device_put(x, repl)

    g_tp = jax.tree_util.tree_map(shard_leaf, g_vars)
    n_sharded = sum(1 for leaf in jax.tree_util.tree_leaves(g_tp)
                    if getattr(leaf, "ndim", 0) == 4 and leaf.shape[-1] % 4 == 0)
    assert n_sharded > 4, "expected several TP-sharded conv kernels"
    with mesh:
        out_I, out_T = jax.jit(model._forward_eval)(
            g_tp, jax.device_put(S, repl), jax.device_put(M, repl),
            jax.device_put(M, repl))
    np.testing.assert_allclose(np.asarray(out_I), np.asarray(ref_I),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_T), np.asarray(ref_T),
                               rtol=1e-4, atol=1e-5)
