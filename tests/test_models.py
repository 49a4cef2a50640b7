"""Init/forward shape + behavior tests for every registry model (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sound_event_detection_dcase2017_task4_tpu.models import (
    MODEL_REGISTRY, get_model, interpolate, pad_framewise_output)

BATCH, T, MEL, CLASSES = 2, 240, 64, 17  # short time axis for test speed


@pytest.fixture(scope="module")
def logmel():
    rng = np.random.RandomState(0)
    return jnp.asarray(rng.randn(BATCH, T, MEL).astype(np.float32))


@pytest.mark.parametrize("name", sorted(MODEL_REGISTRY))
def test_forward_shapes(name, logmel):
    if name == "Cnn_13layers_AvgPooling":
        pytest.skip("covered by test_cnn13 (needs longer T for 6 pools)")
    model = get_model(name, classes_num=CLASSES)
    params = model.init(
        {"params": jax.random.PRNGKey(0)}, logmel, train=False)
    out = model.apply(params, logmel, train=False)
    assert out["clipwise_output"].shape == (BATCH, CLASSES)
    assert out["framewise_output"].shape == (BATCH, T, CLASSES)
    clip = np.asarray(out["clipwise_output"])
    frame = np.asarray(out["framewise_output"])
    assert (clip >= 0).all() and (clip <= 1).all()
    assert (frame >= 0).all() and (frame <= 1).all()
    assert np.isfinite(clip).all() and np.isfinite(frame).all()


def test_cnn13(logmel):
    model = get_model("Cnn_13layers_AvgPooling", classes_num=CLASSES)
    x = jnp.tile(logmel, (1, 3, 1))  # 720 frames → survives 6 pools
    params = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    out = model.apply(params, x, train=False)
    assert out["clipwise_output"].shape == (BATCH, CLASSES)
    assert out["framewise_output"].shape == (BATCH, 720, CLASSES)


def test_train_mode_with_dropout_and_bn(logmel):
    model = get_model("Cnn_9layers_Gru_FrameAtt", classes_num=CLASSES)
    variables = model.init({"params": jax.random.PRNGKey(0)}, logmel,
                           train=False)
    out, mutated = model.apply(
        variables, logmel, train=True,
        rngs={"dropout": jax.random.PRNGKey(1)},
        mutable=["batch_stats"])
    assert "batch_stats" in mutated
    assert out["clipwise_output"].shape == (BATCH, CLASSES)


def test_head_semantics(logmel):
    """max head clipwise == max over time of (pre-upsampled) framewise."""
    model = get_model("Cnn_9layers_MaxPooling", classes_num=CLASSES)
    variables = model.init({"params": jax.random.PRNGKey(0)}, logmel,
                           train=False)
    out = model.apply(variables, logmel, train=False)
    # framewise is an upsample of the pre-pool frames, so its max over time
    # must equal the clipwise max exactly.
    np.testing.assert_allclose(
        np.asarray(out["framewise_output"]).max(axis=1),
        np.asarray(out["clipwise_output"]), atol=1e-6)


def test_att_head_is_convex_combination(logmel):
    """Attention clipwise prob lies within [min, max] of framewise probs."""
    model = get_model("Cnn_9layers_AttPooling", classes_num=CLASSES)
    variables = model.init({"params": jax.random.PRNGKey(0)}, logmel,
                           train=False)
    out = model.apply(variables, logmel, train=False)
    fw = np.asarray(out["framewise_output"])
    cw = np.asarray(out["clipwise_output"])
    assert (cw <= fw.max(axis=1) + 1e-6).all()
    assert (cw >= fw.min(axis=1) - 1e-6).all()


def test_interpolate_and_pad():
    x = jnp.arange(6, dtype=jnp.float32).reshape(1, 3, 2)
    y = interpolate(x, 2)
    assert y.shape == (1, 6, 2)
    np.testing.assert_array_equal(np.asarray(y[0, :2]), np.asarray(x[0, :1]).repeat(2, 0))
    z = pad_framewise_output(y, 9)
    assert z.shape == (1, 9, 2)
    np.testing.assert_array_equal(np.asarray(z[0, 6:]), np.tile(np.asarray(y[0, -1]), (3, 1)))
    # truncation path
    w = pad_framewise_output(y, 4)
    assert w.shape == (1, 4, 2)


def test_bf16_compute():
    model = get_model("Cnn_9layers_AttPooling", classes_num=CLASSES,
                      dtype=jnp.bfloat16)
    x = jnp.zeros((1, T, MEL), jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    out = model.apply(variables, x, train=False)
    # outputs are cast back to f32 regardless of compute dtype
    assert out["clipwise_output"].dtype == jnp.float32
    assert out["framewise_output"].dtype == jnp.float32


def test_unknown_model_type():
    with pytest.raises(KeyError):
        get_model("Cnn_42layers_Nonsense")


def test_fast_batchnorm_matches_flax():
    """The TPU-tuned BatchNorm (f32-accumulated stats on the raw activation,
    folded a*x+b epilogue) must match flax.linen.BatchNorm in f32: outputs,
    gradients, and running-stat updates."""
    from flax import linen as nn

    from sound_event_detection_dcase2017_task4_tpu.models.blocks import (
        BatchNorm)

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(4, 9, 5, 7).astype(np.float32) * 2.0 + 0.5)

    ours = BatchNorm(use_running_average=False, momentum=0.9)
    ref = nn.BatchNorm(use_running_average=False, momentum=0.9)
    v_ours = ours.init(jax.random.PRNGKey(0), x)
    v_ref = ref.init(jax.random.PRNGKey(0), x)
    # same variable layout (checkpoint compatibility with round-1 ckpts)
    assert set(v_ours["params"]) == set(v_ref["params"]) == {"scale", "bias"}
    assert set(v_ours["batch_stats"]) == {"mean", "var"}

    def run(mod, v):
        y, mut = mod.apply(v, x, mutable=["batch_stats"])
        return y, mut["batch_stats"]

    y1, bs1 = run(ours, v_ours)
    y2, bs2 = run(ref, v_ref)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=2e-5)
    np.testing.assert_allclose(np.asarray(bs1["mean"]),
                               np.asarray(bs2["mean"]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(bs1["var"]),
                               np.asarray(bs2["var"]), rtol=1e-5)

    def loss(mod, v):
        y, _ = mod.apply(v, x, mutable=["batch_stats"])
        return jnp.sum(y * y)

    g1 = jax.grad(lambda v: loss(ours, v))(v_ours)["params"]
    g2 = jax.grad(lambda v: loss(ref, v))(v_ref)["params"]
    for k in ("scale", "bias"):
        np.testing.assert_allclose(np.asarray(g1[k]), np.asarray(g2[k]),
                                   rtol=2e-4, atol=2e-4)

    # eval mode uses running stats
    ve = {"params": v_ours["params"], "batch_stats": bs1}
    y_eval = BatchNorm(use_running_average=True).apply(ve, x)
    ve2 = {"params": v_ref["params"], "batch_stats": bs2}
    y_eval_ref = nn.BatchNorm(use_running_average=True).apply(ve2, x)
    np.testing.assert_allclose(np.asarray(y_eval), np.asarray(y_eval_ref),
                               atol=2e-5)


def test_avg_pool_2d_matches_reduce_window():
    from flax import linen as nn

    from sound_event_detection_dcase2017_task4_tpu.models.blocks import (
        avg_pool_2d)

    rng = np.random.RandomState(1)
    for shape in [(2, 8, 6, 3), (2, 9, 7, 3)]:      # even + odd (ragged tail)
        x = jnp.asarray(rng.randn(*shape).astype(np.float32))
        got = avg_pool_2d(x, (2, 2))
        want = nn.avg_pool(x, (2, 2), strides=(2, 2))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-6)


def test_fast_dropout_semantics():
    """models.blocks.Dropout: u16-bit masks, exact inverse-scale, eval
    passthrough (the 16-bit draw halves the mask-RNG HBM traffic — see
    RESULTS.md round-2b)."""
    from sound_event_detection_dcase2017_task4_tpu.models.blocks import Dropout

    x = jnp.ones((64, 1024), jnp.float32)
    drop = Dropout(rate=0.2, deterministic=False)
    y = drop.apply({}, x, rngs={"dropout": jax.random.PRNGKey(0)})
    y = np.asarray(y)

    # kept elements are scaled by exactly 1/keep_q with keep_q = 52429/65536
    keep_q = round(0.8 * 65536) / 65536
    kept = y[y != 0]
    np.testing.assert_allclose(kept, 1.0 / keep_q, rtol=1e-6)
    # empirical drop rate matches the quantized keep probability
    frac = (y != 0).mean()
    assert abs(frac - keep_q) < 0.01, frac
    # E[dropout(x)] == x exactly in expectation: mean ≈ 1
    assert abs(y.mean() - 1.0) < 0.01, y.mean()

    # deterministic given the key
    y2 = drop.apply({}, x, rngs={"dropout": jax.random.PRNGKey(0)})
    np.testing.assert_array_equal(y, np.asarray(y2))
    y3 = drop.apply({}, x, rngs={"dropout": jax.random.PRNGKey(1)})
    assert (y != np.asarray(y3)).any()

    # eval mode / rate 0: identity without consuming an rng
    eval_out = Dropout(rate=0.2, deterministic=True).apply({}, x)
    np.testing.assert_array_equal(np.asarray(eval_out), np.asarray(x))
    zero_out = Dropout(rate=0.0, deterministic=False).apply({}, x)
    np.testing.assert_array_equal(np.asarray(zero_out), np.asarray(x))

    # bf16 activations keep their dtype
    yb = drop.apply({}, x.astype(jnp.bfloat16),
                    rngs={"dropout": jax.random.PRNGKey(0)})
    assert yb.dtype == jnp.bfloat16


def test_fast_dropout_rate_one_drops_everything():
    """flax.linen.Dropout parity at the rate=1.0 edge (used to assert)."""
    from sound_event_detection_dcase2017_task4_tpu.models.blocks import Dropout

    x = jnp.ones((4, 8), jnp.float32)
    y = Dropout(rate=1.0, deterministic=False).apply(
        {}, x, rngs={"dropout": jax.random.PRNGKey(0)})
    np.testing.assert_array_equal(np.asarray(y), np.zeros_like(x))


def test_lin_exp_pooling_properties():
    """Linear-/exp-softmax MIL poolings (arXiv:1810.09050): both are
    self-weighted means of the framewise probabilities, so clipwise must
    lie in [framewise min, framewise max] and dominate plain averaging
    (E[y^2]/E[y] = E[y] + Var/E[y] >= E[y])."""
    import numpy as np

    from sound_event_detection_dcase2017_task4_tpu.models import get_model

    x = np.random.RandomState(0).randn(2, 64, 64).astype(np.float32)
    for name in ("Cnn_9layers_LinPooling", "Cnn_9layers_ExpPooling"):
        model = get_model(name)
        import jax

        variables = model.init({"params": jax.random.PRNGKey(0)},
                               x, train=False)
        out = model.apply(variables, x, train=False)
        clip = np.asarray(out["clipwise_output"])
        frame_pre = np.asarray(out["framewise_output"])
        assert clip.shape == (2, 17)
        assert (clip >= 0).all() and (clip <= 1).all()
        # self-weighted mean >= plain mean of the same framewise probs
        # (framewise_output is the upsampled repeat of the pooled frames,
        # so its mean equals the pre-upsample mean up to edge padding)
        avg = frame_pre.mean(axis=1)
        assert (clip >= avg - 1e-3).all(), name
