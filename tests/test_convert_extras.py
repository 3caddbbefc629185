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
    # quirk of the reference's sequential chain (kept for exact parity):
    # conv1_ rewrites to stem.conv. BEFORE the bn suffix rules fire
    assert convert("conv1_bn_s") == "s1.pathway0_stem.conv.bn.weight"
    assert convert("conv1_bn_rm") == "s1.pathway0_stem.conv.bn.running_mean"
    assert convert("res_conv1_bn_s") == "s1.pathway0_stem.bn.weight"
    assert convert("res2_0_branch2a_w") == "s2.pathway0_res0.branch2.a.weight"
    assert convert("res3_1_branch1_w") == "s3.pathway0_res1.branch1.weight"
    assert convert("res4_2_branch2c_bn_riv") == \
        "s4.pathway0_res2.branch2.c_bn.running_var"
    assert convert("pred_w") == "head.projection.weight"
    # unknown names pass through
    assert convert("some_other_blob") == "some_other_blob"


def test_c2_name_conversion_matches_reference():
    """Full-rule-chain parity vs the reference's get_name_convert_func
    (c2_model_loading.py:9-120) over a corpus covering every rule group."""
    import importlib.util

    from aicity_action_tpu.utils.convert import get_c2_name_convert_func

    spec = importlib.util.spec_from_file_location(
        "ref_c2", "/root/reference/slowfast/utils/c2_model_loading.py")
    ref_mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref_mod)
    ref = ref_mod.get_name_convert_func()
    ours = get_c2_name_convert_func()

    corpus = [
        "conv1_w", "conv1_b", "conv1_bn_s", "conv1_bn_b", "conv1_bn_rm",
        "conv1_bn_riv", "conv1_xy_w", "res_conv1_bn_s", "res_conv1_w",
        "res2_0_branch1_w", "res2_0_branch1_bn_s", "res4_4_branch2c_w",
        "res4_4_branch2c_bn_b", "res5_2_branch2a_bn_rm",
        "t_conv1_w", "t_res_conv1_bn_s", "t_res4_0_branch1_w",
        "t_res4_4_branch2c_bn_riv",
        "t_pool1_subsample_w", "t_pool1_subsample_bn_s",
        "t_res4_5_branch2c_bn_subsample_bn_rm",
        "t_res4_5_branch2c_bn_subsample_w",
        "nonlocal_conv3_1_theta_w", "nonlocal_conv3_1_g_w",
        "nonlocal_conv3_1_phi_b", "nonlocal_conv3_1_out_w",
        "nonlocal_conv4_5_bn_s", "nonlocal_conv4_5_bn_rm",
        "pred_w", "pred_b", "conv_5_w", "lin_5_b",
        "res5_0_b_bn_fc_w", "head_b",
    ]
    for name in corpus:
        assert ours(name) == ref(name), (name, ours(name), ref(name))
