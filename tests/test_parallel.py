"""Data-parallel correctness on the 8-fake-device CPU mesh (SURVEY.md §4):
N-device sharded training must match 1-device training at equal global batch.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sound_event_detection_dcase2017_task4_tpu import train
from sound_event_detection_dcase2017_task4_tpu.config import Config
from sound_event_detection_dcase2017_task4_tpu.models import SedCnn
from sound_event_detection_dcase2017_task4_tpu.parallel import (
    batch_sharding, make_mesh, replicated_sharding, shard_batch)

# CPU-compile-heavy: excluded from the fast tier (pytest -m "not slow")
pytestmark = pytest.mark.slow

CLASSES = 17


@pytest.fixture(scope="module")
def setup():
    assert jax.device_count() >= 8, "conftest must provide 8 fake devices"
    model = SedCnn(classes_num=CLASSES, channels=(8, 16), head="att")
    cfg = Config()
    rng = np.random.RandomState(0)
    x = rng.randn(16, 64, 64).astype(np.float32)
    y = (rng.rand(16, CLASSES) < 0.2).astype(np.float32)
    return model, cfg, jnp.asarray(x), jnp.asarray(y)


def test_mesh_construction():
    mesh = make_mesh()
    assert mesh.size == 8
    assert mesh.axis_names == ("data",)


def test_sharded_step_matches_single_device(setup):
    model, cfg, x, y = setup

    def run(n_steps, shard: bool):
        state, tx = train.create_train_state(model, cfg, example_frames=64,
                                             seed=7)
        step = train.make_train_step(model, tx, donate_state=False)
        if shard:
            mesh = make_mesh()
            state = jax.device_put(state, replicated_sharding(mesh))
            xb = jax.device_put(x, batch_sharding(mesh))
            yb = jax.device_put(y, batch_sharding(mesh))
        else:
            xb, yb = x, y
        losses = []
        for _ in range(n_steps):
            state, m = step(state, xb, yb)
            losses.append(float(m["loss"]))
        return state, losses

    s1, l1 = run(4, shard=False)
    s8, l8 = run(4, shard=True)

    np.testing.assert_allclose(l1, l8, rtol=2e-5, atol=1e-6)
    # batch stats (global-batch BN means/vars) must agree across layouts
    for a, b in zip(jax.tree_util.tree_leaves(s1.batch_stats),
                    jax.tree_util.tree_leaves(s8.batch_stats)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_sharded_gradients_match_single_device(setup):
    """Gradient equivalence at matched state — the sharp check for missing
    psum / wrong gradient averaging (a missing mean over devices scales
    grads by n_devices; tolerances here would catch even a 1% skew). Params
    after several Adam steps are NOT compared: near-zero gradients make the
    early Adam update sign-like, so benign f32 reduction-order noise flips
    individual coordinates by a full learning-rate step."""
    from sound_event_detection_dcase2017_task4_tpu.losses import clip_bce

    model, cfg, x, y = setup
    state, _ = train.create_train_state(model, cfg, example_frames=64, seed=3)

    def loss_of(params, xb, yb):
        out = model.apply(
            {"params": params, "batch_stats": state.batch_stats},
            xb, train=False)
        return clip_bce(out, yb)

    grad_fn = jax.jit(jax.grad(loss_of))
    g1 = grad_fn(state.params, x, y)

    mesh = make_mesh()
    params8 = jax.device_put(state.params, replicated_sharding(mesh))
    g8 = grad_fn(params8,
                 jax.device_put(x, batch_sharding(mesh)),
                 jax.device_put(y, batch_sharding(mesh)))
    leaves1 = [np.asarray(a) for a in jax.tree_util.tree_leaves(g1)]
    leaves8 = [np.asarray(b) for b in jax.tree_util.tree_leaves(g8)]
    # floor the per-leaf scale at 1e-3 of the global gradient magnitude so
    # degenerate leaves (e.g. the softmax-shift-invariant attention bias,
    # whose true gradient is ~0) don't amplify f32 residue into "mismatches".
    global_scale = max(np.abs(a).max() for a in leaves1)
    for a, b in zip(leaves1, leaves8):
        scale = max(np.abs(a).max(), 1e-3 * global_scale)
        np.testing.assert_allclose(a / scale, b / scale, atol=1e-4)


def test_eval_step_sharded(setup):
    model, cfg, x, y = setup
    mesh = make_mesh()
    state, _ = train.create_train_state(model, cfg, example_frames=64)
    state = jax.device_put(state, replicated_sharding(mesh))
    eval_step = train.make_eval_step(model)
    out_sharded = eval_step(state, jax.device_put(x, batch_sharding(mesh)))
    # unsharded leg: genuinely unsharded state (host numpy pytree)
    unsharded_state = jax.tree_util.tree_map(np.asarray,
                                             jax.device_get(state))
    out_plain = eval_step(unsharded_state, x)
    np.testing.assert_allclose(
        np.asarray(out_sharded["clipwise_output"]),
        np.asarray(out_plain["clipwise_output"]), rtol=1e-5, atol=1e-6)


def test_shard_batch_helper(setup):
    _, _, x, y = setup
    mesh = make_mesh()
    xs, ys = shard_batch((np.asarray(x), np.asarray(y)), mesh)
    assert xs.sharding.spec == batch_sharding(mesh).spec
    np.testing.assert_array_equal(np.asarray(xs), np.asarray(x))


def test_sharded_forward_generator_handles_ragged_batches(setup):
    """Sharded eval with zero-padded ragged batches == unsharded eval."""
    model, cfg, x, y = setup
    state, _ = train.create_train_state(model, cfg, example_frames=64)
    eval_step = train.make_eval_step(model)
    xn, yn = np.asarray(x), np.asarray(y)

    def gen():
        yield xn[:8], yn[:8]
        yield xn[8:13], yn[8:13]      # ragged: 5 not divisible by 8

    mesh = make_mesh()
    out_sharded = train.forward_generator(
        eval_step, state, gen(), sharding=batch_sharding(mesh))
    out_plain = train.forward_generator(eval_step, state, gen())
    assert out_sharded["clipwise_output"].shape == (13, 17)
    np.testing.assert_allclose(out_sharded["clipwise_output"],
                               out_plain["clipwise_output"],
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(out_sharded["target"], out_plain["target"])
