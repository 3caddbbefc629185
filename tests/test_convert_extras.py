"""Checkpoint conversion extras: 2D inflation and caffe2 name rules."""

import numpy as np

from aicity_action_tpu.utils.convert import (
    get_c2_name_convert_func,
    inflate_2d_to_3d,
)


def test_inflate_2d_to_3d():
    w2 = np.random.RandomState(0).randn(8, 3, 7, 7).astype(np.float32)
    w3 = inflate_2d_to_3d(w2, time_dim=5)
    assert w3.shape == (8, 3, 5, 7, 7)
    # repeat/divide preserves the conv response to temporally-constant input
    np.testing.assert_allclose(w3.sum(axis=2), w2, rtol=1e-6)


def test_c2_name_rules():
    convert = get_c2_name_convert_func()
    assert convert("conv1_w") == "s1.pathway0_stem.conv.weight"
    assert convert("conv1_bn_s") == "s1.pathway0_stem.bn.weight"
    assert convert("conv1_bn_rm") == "s1.pathway0_stem.bn.running_mean"
    assert convert("res2_0_branch2a_w") == "s2.pathway0_res0.branch2.a.weight"
    assert convert("res3_1_branch1_w") == "s3.pathway0_res1.branch1.weight"
    assert convert("res4_2_branch2c_bn_riv") == \
        "s4.pathway0_res2.branch2.c_bn.running_var"
    assert convert("pred_w") == "head.projection.weight"
    # unknown names pass through
    assert convert("some_other_blob") == "some_other_blob"
