"""Train-step smoke tests: loss decreases, checkpoint round-trip, mixup."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sound_event_detection_dcase2017_task4_tpu import checkpoints, train
from sound_event_detection_dcase2017_task4_tpu.config import Config
from sound_event_detection_dcase2017_task4_tpu.models import SedCnn

CLASSES = 17


@pytest.fixture(scope="module")
def tiny_model():
    return SedCnn(classes_num=CLASSES, channels=(16, 32), head="att")


@pytest.fixture(scope="module")
def batch():
    rng = np.random.RandomState(0)
    x = rng.randn(8, 96, 64).astype(np.float32)
    y = (rng.rand(8, CLASSES) < 0.2).astype(np.float32)
    # make the task learnable: class k active iff mel band around k is loud
    for i in range(8):
        for k in np.where(y[i])[0]:
            x[i, :, (k * 3) % 64] += 3.0
    return jnp.asarray(x), jnp.asarray(y)


def test_loss_decreases(tiny_model, batch):
    cfg = Config()
    state, tx = train.create_train_state(
        tiny_model, cfg, learning_rate=3e-3, example_frames=96)
    step = train.make_train_step(tiny_model, tx, donate_state=False)
    x, y = batch
    losses = []
    for _ in range(30):
        state, metrics = step(state, x, y)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0] * 0.75, losses[::10]
    assert np.isfinite(losses).all()
    assert int(state.step) == 30


def test_mixup_convexity():
    rng = jax.random.PRNGKey(0)
    x = jnp.stack([jnp.zeros((4, 3)), jnp.ones((4, 3))])
    y = jnp.asarray([[0.0, 1.0], [1.0, 0.0]])
    mx, my = train.mixup(rng, x, y, alpha=1.0)
    assert ((mx >= 0) & (mx <= 1)).all()
    assert ((my >= 0) & (my <= 1)).all()
    # λ is shared between x and y per example: row sums of y stay 1
    np.testing.assert_allclose(np.asarray(my).sum(axis=1), 1.0, atol=1e-6)


def test_train_step_with_mixup(tiny_model, batch):
    cfg = Config()
    state, tx = train.create_train_state(tiny_model, cfg, example_frames=96)
    step = train.make_train_step(tiny_model, tx, mixup_alpha=1.0,
                                 donate_state=False)
    x, y = batch
    state, metrics = step(state, x, y)
    assert np.isfinite(float(metrics["loss"]))


def test_checkpoint_roundtrip(tiny_model, batch, tmp_path):
    cfg = Config()
    state, tx = train.create_train_state(tiny_model, cfg, example_frames=96)
    step = train.make_train_step(tiny_model, tx, donate_state=False)
    x, y = batch
    for _ in range(3):
        state, _ = step(state, x, y)

    path = checkpoints.save_checkpoint(str(tmp_path), state)
    assert path.endswith("3_iterations.ckpt")
    template, _ = train.create_train_state(tiny_model, cfg, example_frames=96)
    restored = checkpoints.load_checkpoint(path, template)

    # resume determinism: one more step from saved vs restored is identical
    s1, m1 = step(state, x, y)
    s2, m2 = step(restored, x, y)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-6)
    leaves1 = jax.tree_util.tree_leaves(s1.params)
    leaves2 = jax.tree_util.tree_leaves(s2.params)
    for a, b in zip(leaves1, leaves2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    assert checkpoints.latest_checkpoint(str(tmp_path)) == path


def test_eval_step_deterministic(tiny_model, batch):
    cfg = Config()
    state, _ = train.create_train_state(tiny_model, cfg, example_frames=96)
    eval_step = train.make_eval_step(tiny_model)
    x, _ = batch
    o1 = eval_step(state, x)
    o2 = eval_step(state, x)
    np.testing.assert_array_equal(np.asarray(o1["clipwise_output"]),
                                  np.asarray(o2["clipwise_output"]))


def test_spec_augment_masks_and_preserves_shape():
    import jax

    x = jnp.ones((2, 100, 64)) * 5.0
    out = train.spec_augment(jax.random.PRNGKey(0), x,
                             time_masks=2, time_width=30,
                             freq_masks=2, freq_width=16)
    assert out.shape == x.shape
    # fill value equals the per-example mean (here 5.0) so masking an
    # all-constant input is a no-op
    np.testing.assert_allclose(np.asarray(out), 5.0, atol=1e-6)
    # on varied input, some values must change
    rng = np.random.RandomState(0)
    x2 = jnp.asarray(rng.randn(2, 100, 64).astype(np.float32))
    out2 = train.spec_augment(jax.random.PRNGKey(1), x2)
    assert (np.asarray(out2) != np.asarray(x2)).any()


def test_train_step_with_spec_augment(tiny_model, batch):
    cfg = Config()
    state, tx = train.create_train_state(tiny_model, cfg, example_frames=96)
    step = train.make_train_step(tiny_model, tx, use_spec_augment=True,
                                 mixup_alpha=1.0, donate_state=False)
    x, y = batch
    state, metrics = step(state, x, y)
    assert np.isfinite(float(metrics["loss"]))


def test_checkpoint_loads_across_compute_dtype(tmp_path):
    """bf16/remat are compute-graph choices; params stay f32, so checkpoints
    must be interchangeable across those flags (verified on TPU; pinned here)."""
    from sound_event_detection_dcase2017_task4_tpu.models import get_model

    m_f32 = get_model("Cnn_5layers_AvgPooling")
    state, tx = train.create_train_state(m_f32, Config(), example_frames=32)
    step = train.make_train_step(m_f32, tx, donate_state=False)
    x = jnp.zeros((2, 32, 64), jnp.float32)
    y = jnp.zeros((2, 17), jnp.float32)
    state, _ = step(state, x, y)
    path = checkpoints.save_checkpoint(str(tmp_path), state)

    m_bf16 = get_model("Cnn_5layers_AvgPooling", dtype=jnp.bfloat16,
                       remat=True)
    template, _ = train.create_train_state(m_bf16, Config(),
                                           example_frames=32)
    restored = checkpoints.load_checkpoint(path, template)
    out = train.make_eval_step(m_bf16)(restored, x)
    assert np.isfinite(np.asarray(out["clipwise_output"])).all()
    # param values identical after the round trip
    a = jax.tree_util.tree_leaves(state.params)
    b = jax.tree_util.tree_leaves(restored.params)
    for u, v in zip(a, b):
        np.testing.assert_array_equal(np.asarray(u), np.asarray(v))


def test_transformer_default_optimizer_warmup_and_clip(tmp_path):
    """Transformer variants get LR warmup + grad clipping BY DEFAULT (hard-
    corpus round-3 finding: the reference recipe saturates/destabilizes the
    attention stack); other families keep the plain reference Adam. The
    defaults are model-derived, so a checkpoint written by `train` loads
    into the template any eval path builds for the same model_type."""
    tf_model = SedCnn(classes_num=CLASSES, channels=(8, 16),
                      seq="transformer", transformer_layers=1)
    state, tx = train.create_train_state(tf_model, Config(),
                                         example_frames=64)
    # warmup: effective LR at step 0 is ~0 → params barely move on a step
    # with a huge gradient; grad clip caps the update thereafter
    step = train.make_train_step(tf_model, tx, donate_state=False)
    x = jnp.full((2, 64, 64), 5.0, jnp.float32)
    y = jnp.zeros((2, CLASSES), jnp.float32)
    before = jax.tree_util.tree_leaves(state.params)
    state1, m = step(state, x, y)
    after = jax.tree_util.tree_leaves(state1.params)
    delta = max(float(jnp.max(jnp.abs(a - b))) for a, b in zip(before, after))
    assert np.isfinite(float(m["loss"]))
    assert delta < 1e-5, f"warmup step-0 LR should be ~0, moved {delta}"

    # checkpoint structure round-trips through an independently-built
    # template (the serving/inference path)
    path = checkpoints.save_checkpoint(str(tmp_path), state1)
    template, _ = train.create_train_state(tf_model, Config(),
                                           example_frames=64, seed=9)
    restored = checkpoints.load_checkpoint(path, template)
    assert int(restored.step) == int(state1.step)

    # non-transformer default is untouched reference Adam: step-0 update
    # moves params at full LR
    cnn = SedCnn(classes_num=CLASSES, channels=(8, 16))
    s2, tx2 = train.create_train_state(cnn, Config(), example_frames=64)
    step2 = train.make_train_step(cnn, tx2, donate_state=False)
    b2 = jax.tree_util.tree_leaves(s2.params)
    s2b, _ = step2(s2, x, y)
    a2 = jax.tree_util.tree_leaves(s2b.params)
    d2 = max(float(jnp.max(jnp.abs(a - b))) for a, b in zip(b2, a2))
    assert d2 > 1e-5


def test_warmup_overrides_disable(tmp_path):
    """--warmup_steps=0 --grad_clip=0 restores the reference recipe (and the
    pre-round-3 opt_state layout) for transformer models too."""
    import optax

    tf_model = SedCnn(classes_num=CLASSES, channels=(8, 16),
                      seq="transformer", transformer_layers=1)
    state, _ = train.create_train_state(tf_model, Config(),
                                        example_frames=64,
                                        warmup_steps=0, grad_clip=0.0)
    plain = optax.adam(1e-3, b1=0.9, b2=0.999).init(state.params)
    same = jax.tree_util.tree_structure(state.opt_state) == \
        jax.tree_util.tree_structure(plain)
    assert same


def test_opt_config_sidecar_roundtrip(tiny_model, tmp_path):
    """Round-4 verdict item 6: the resolved optimizer recipe is recorded
    next to the checkpoint and validated (or auto-adopted) on load, so
    non-default --warmup_steps/--grad_clip never silently fork the
    opt_state layout for eval/serving."""
    cfg = Config()
    state, _ = train.create_train_state(
        tiny_model, cfg, example_frames=96, learning_rate=5e-4,
        warmup_steps=123, grad_clip=0.5)
    oc = train.resolve_opt_config(tiny_model, 5e-4, 123, 0.5)
    path = checkpoints.save_checkpoint(str(tmp_path), state, opt_config=oc)
    assert checkpoints.load_opt_config(path) == {
        "learning_rate": 5e-4, "warmup_steps": 123, "grad_clip": 0.5}

    # serving-style reload: build the template FROM the sidecar, no flags
    saved = checkpoints.load_opt_config(path)
    template, _ = train.create_train_state(
        tiny_model, cfg, example_frames=96,
        learning_rate=saved["learning_rate"],
        warmup_steps=saved["warmup_steps"], grad_clip=saved["grad_clip"])
    restored = checkpoints.load_checkpoint(path, template, opt_config=saved)
    assert jax.tree_util.tree_structure(restored.opt_state) \
        == jax.tree_util.tree_structure(state.opt_state)

    # a mismatched recipe errors clearly instead of mis-deserializing
    bad = train.resolve_opt_config(tiny_model, 1e-3, None, None)
    with pytest.raises(ValueError, match="optimizer config mismatch"):
        checkpoints.load_checkpoint(path, template, opt_config=bad)

    # legacy (sidecar-less) checkpoints stay loadable with any opt_config
    legacy_dir = tmp_path / "legacy"
    legacy = checkpoints.save_checkpoint(str(legacy_dir), state)
    assert checkpoints.load_opt_config(legacy) is None
    checkpoints.check_opt_config(legacy, bad)   # no raise


def test_transformer_resolve_opt_config_defaults():
    """Transformer variants get the measured stability defaults; everything
    else keeps the byte-identical reference recipe."""
    from sound_event_detection_dcase2017_task4_tpu.models import get_model

    tr = get_model("Cnn_9layers_Transformer_FrameAtt")
    assert train.resolve_opt_config(tr) == {
        "learning_rate": 1e-3,
        "warmup_steps": train.TRANSFORMER_WARMUP_STEPS,
        "grad_clip": train.TRANSFORMER_GRAD_CLIP}
    cnn = get_model("Cnn_9layers_AvgPooling")
    assert train.resolve_opt_config(cnn) == {
        "learning_rate": 1e-3, "warmup_steps": 0, "grad_clip": 0.0}


def test_honor_platform_env_is_one_directional(monkeypatch):
    """runtime.honor_platform_env may only honor a CPU escape request —
    re-asserting a TPU platform from the env would flip a process that
    deliberately forced CPU (conftest, parity harness) back onto a
    possibly-dead tunnel (round-4 regression: this hung the whole suite)."""
    from sound_event_detection_dcase2017_task4_tpu import runtime

    assert jax.config.jax_platforms == "cpu"     # conftest's force
    monkeypatch.setenv("JAX_PLATFORMS", "axon")
    runtime.honor_platform_env()
    assert jax.config.jax_platforms == "cpu"     # unchanged
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    runtime.honor_platform_env()                 # no-op (already cpu)
    assert jax.config.jax_platforms == "cpu"


def test_prune_checkpoints(tiny_model, tmp_path):
    """Retention keeps the N newest + any protected iteration, removing
    sidecars alongside (round-4 --keep_checkpoints)."""
    cfg = Config()
    state, _ = train.create_train_state(tiny_model, cfg, example_frames=96)
    oc = train.resolve_opt_config(tiny_model)
    for it in (0, 10, 20, 30, 40):
        checkpoints.save_checkpoint(str(tmp_path), state, it, opt_config=oc)
        (tmp_path / f"{it}_iterations.datastate.pkl").write_bytes(b"x")

    deleted = checkpoints.prune_checkpoints(str(tmp_path), keep=2,
                                            protect=(10,))
    names = sorted(os.listdir(tmp_path))
    # kept: 30, 40 (newest two) + protected 10; deleted: 0, 20
    assert [os.path.basename(d) for d in deleted] == [
        "0_iterations.ckpt", "20_iterations.ckpt"]
    for it in (10, 30, 40):
        assert f"{it}_iterations.ckpt" in names
        assert f"{it}_iterations.optjson" in names
    for it in (0, 20):
        assert f"{it}_iterations.ckpt" not in names
        assert f"{it}_iterations.optjson" not in names
        assert f"{it}_iterations.datastate.pkl" not in names
    # keep=0 is the reference behavior: no-op
    assert checkpoints.prune_checkpoints(str(tmp_path), keep=0) == []


def test_forward_generator_prefetch_matches_serial(tiny_model, batch):
    """Round-4 verdict item 4: the eval path stages batches from a
    producer thread; outputs must be identical to the serial path, for
    ragged finals too, and order must be preserved."""
    cfg = Config()
    state, _ = train.create_train_state(tiny_model, cfg, example_frames=96)
    eval_step = train.make_eval_step(tiny_model)
    x, y = np.asarray(batch[0]), np.asarray(batch[1])

    def gen():
        yield x[:3], y[:3]
        yield x[3:6], y[3:6]
        yield x[6:8], y[6:8]          # ragged final

    out_pre = train.forward_generator(eval_step, state, gen(), prefetch=2)
    out_ser = train.forward_generator(eval_step, state, gen(), prefetch=0)
    np.testing.assert_array_equal(out_pre["clipwise_output"],
                                  out_ser["clipwise_output"])
    np.testing.assert_array_equal(out_pre["framewise_output"],
                                  out_ser["framewise_output"])
    np.testing.assert_array_equal(out_pre["target"], y)


def test_forward_generator_propagates_producer_error(tiny_model):
    """A reader crash in the staging thread must surface, not truncate."""
    cfg = Config()
    state, _ = train.create_train_state(tiny_model, cfg, example_frames=96)
    eval_step = train.make_eval_step(tiny_model)

    def gen():
        yield (np.zeros((2, 96, 64), np.float32),
               np.zeros((2, CLASSES), np.float32))
        raise OSError("simulated HDF5 read failure")

    with pytest.raises(RuntimeError, match="prefetch producer"):
        train.forward_generator(eval_step, state, gen(), prefetch=2)
