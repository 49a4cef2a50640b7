"""Driver entry points must work on the fake-CPU mesh (the driver's check)."""

import sys

import jax
import numpy as np
import pytest

sys.path.insert(0, "/root/repo")


def test_entry_forward():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    clip, frame = jax.jit(fn)(*args)
    assert clip.shape == (4, 17)
    assert frame.shape[0] == 4 and frame.shape[2] == 17
    assert np.isfinite(np.asarray(clip)).all()


def test_dryrun_multichip_8():
    import __graft_entry__ as ge

    if jax.device_count() < 8:
        pytest.skip("needs 8 fake devices")
    ge.dryrun_multichip(8)


def test_check_numerics_flag():
    import jax.numpy as jnp

    from sound_event_detection_dcase2017_task4_tpu import train
    from sound_event_detection_dcase2017_task4_tpu.config import Config
    from sound_event_detection_dcase2017_task4_tpu.models import SedCnn

    model = SedCnn(classes_num=17, channels=(8,), head="avg")
    state, tx = train.create_train_state(model, Config(), example_frames=32)
    step = train.make_train_step(model, tx, check_numerics=True,
                                 donate_state=False)
    x = jnp.zeros((2, 32, 64), jnp.float32)
    y = jnp.zeros((2, 17), jnp.float32)
    _, m = step(state, x, y)
    assert int(m["nonfinite_count"]) == 0
    # poison the input: frontend-normalized NaNs must be detected
    x_bad = x.at[0, 0, 0].set(jnp.nan)
    _, m2 = step(state, x_bad, y)
    assert int(m2["nonfinite_count"]) > 0
