r"""Utility-layer tests: config reflection, adapters, conv math, transforms,
visualization primitives, hyperopt config validation."""
import numpy as np
import pytest

from vp_suite_tpu.utils.utils import (most, set_from_kwarg, get_public_attrs,
                                      check_optuna_config)
from vp_suite_tpu.utils.models import (conv_output_shape, convtransp_output_shape,
                                       ScaleToModel, ScaleToTest)


def test_most():
    assert most([1, 1, 1, 0])
    assert not most([1, 0, 0])
    assert not most([])


def test_set_from_kwarg_type_check():
    class Obj:
        x = 1
    o = Obj()
    set_from_kwarg(o, {"x": 5}, "x")
    assert o.x == 5
    with pytest.raises(TypeError):
        set_from_kwarg(o, {"x": "bad"}, "x")
    with pytest.raises(ValueError):
        set_from_kwarg(o, {}, "y", required=True)
    with pytest.raises(ValueError):
        set_from_kwarg(o, {"x": 9}, "x", choices=[1, 2, 3])


def test_get_public_attrs_skips_constants_and_privates():
    class Obj:
        CONST = 1
        _private = 2
        value = 3

        def method(self):
            pass
    attrs = get_public_attrs(Obj())
    assert attrs == {"value": 3}


def test_conv_shape_math():
    assert conv_output_shape((64, 64), 3, 2, 1) == (32, 32)
    assert convtransp_output_shape((32, 32), 4, 2, 1) == (64, 64)
    # inverse pair used by the EF models
    h, w = conv_output_shape((64, 64), 3, 1, 1)
    assert (h, w) == (64, 64)


def test_value_range_adapters_roundtrip():
    x = np.random.default_rng(0).random((4, 4)).astype(np.float32)
    to_model = ScaleToModel([-1.0, 1.0], [0.0, 1.0])
    to_test = ScaleToTest([-1.0, 1.0], [0.0, 1.0])
    xm = to_model(x)
    assert xm.min() >= -1.0 and xm.max() <= 1.0
    np.testing.assert_allclose(to_test(xm), x, atol=1e-6)


def test_check_optuna_config():
    check_optuna_config({"lr": {"min": 1e-5, "max": 1e-3}})
    check_optuna_config({"batch_size": {"choices": [8, 16]}})
    with pytest.raises(ValueError):
        check_optuna_config({"lr": {"max": 1e-3}})
    with pytest.raises(ValueError):
        check_optuna_config({"lr": {"min": 1.0, "max": 0.1}})
    with pytest.raises(ValueError):
        check_optuna_config({"lr": {"choices": []}})


def test_add_borders_and_gif(tmp_path):
    from vp_suite_tpu.utils.visualization import add_borders, save_vid_vis
    seq = (np.random.default_rng(0).random((4, 8, 8, 3)) * 255).astype(np.uint8)
    bordered = add_borders(seq, context_frames=2)
    assert bordered.shape == (4, 12, 12, 3)
    out = save_vid_vis(tmp_path / "vis", context_frames=2, GT=seq, Pred=seq)
    assert str(out).endswith(".gif")
    import os
    assert os.path.getsize(out) > 0


def test_reduce_lr_on_plateau():
    from vp_suite_tpu.training.schedule import ReduceLROnPlateau
    s = ReduceLROnPlateau(lr=1.0, patience=1, factor=0.5, min_lr=0.1)
    assert s.step(1.0) == 1.0     # first: sets best
    assert s.step(0.5) == 1.0     # improvement
    assert s.step(0.6) == 1.0     # bad 1 (within patience)
    assert s.step(0.7) == 0.5     # bad 2 -> reduce
    for _ in range(10):
        s.step(2.0)
    assert s.lr >= 0.1            # floors at min_lr
