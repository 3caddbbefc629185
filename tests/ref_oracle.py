"""Load reference leaf modules as numerical oracles.

The reference package isn't importable wholesale (fvcore/iopath absent), but
`slowfast/models/attention.py` and `common.py` depend only on torch/numpy, so
we load them standalone with a stubbed package namespace. This gives parity
tests a true golden oracle without copying reference code into this repo.
"""

import importlib.util
import sys
import types

REF = "/root/reference/slowfast/models"


def _load(name: str, path: str):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def load_reference_attention():
    """Returns the reference attention module (MultiScaleBlock etc.)."""
    if "slowfast.models.attention" in sys.modules:
        return sys.modules["slowfast.models.attention"]
    # stub the package chain so `from slowfast.models.common import ...` works
    for pkg in ("slowfast", "slowfast.models"):
        if pkg not in sys.modules:
            sys.modules[pkg] = types.ModuleType(pkg)
    common = _load("slowfast.models.common", f"{REF}/common.py")
    sys.modules["slowfast.models"].common = common
    attention = _load("slowfast.models.attention", f"{REF}/attention.py")
    return attention


def load_reference_convnets():
    """Returns (resnet_helper, stem_helper) reference modules as oracles."""
    if "slowfast.models.resnet_helper" in sys.modules:
        return (sys.modules["slowfast.models.resnet_helper"],
                sys.modules["slowfast.models.stem_helper"])
    load_reference_attention()  # sets up package stubs + common
    operators = _load("slowfast.models.operators", f"{REF}/operators.py")
    sys.modules["slowfast.models"].operators = operators
    nonlocal_helper = _load(
        "slowfast.models.nonlocal_helper", f"{REF}/nonlocal_helper.py")
    sys.modules["slowfast.models"].nonlocal_helper = nonlocal_helper
    resnet_helper = _load(
        "slowfast.models.resnet_helper", f"{REF}/resnet_helper.py")
    stem_helper = _load("slowfast.models.stem_helper", f"{REF}/stem_helper.py")
    return resnet_helper, stem_helper


def load_reference_heads():
    """Reference head_helper with a stubbed detectron2.ROIAlign import."""
    if "slowfast.models.head_helper" in sys.modules:
        return sys.modules["slowfast.models.head_helper"]
    load_reference_attention()
    if "detectron2" not in sys.modules:
        det = types.ModuleType("detectron2")
        layers = types.ModuleType("detectron2.layers")

        class _ROIAlignStub:  # only the non-ROI heads are used as oracles
            def __init__(self, *a, **k):
                raise NotImplementedError("ROIAlign stub")

        layers.ROIAlign = _ROIAlignStub
        det.layers = layers
        sys.modules["detectron2"] = det
        sys.modules["detectron2.layers"] = layers
    return _load("slowfast.models.head_helper", f"{REF}/head_helper.py")


def load_reference_video_models():
    """Full reference `video_model_builder` (SlowFast/ResNet/X3D classes),
    loaded with stubbed fvcore/detectron2 so the torch models carry the exact
    module names real `.pyth` checkpoints have (the converter's contract)."""
    if "slowfast.models.video_model_builder" in sys.modules:
        return sys.modules["slowfast.models.video_model_builder"]
    load_reference_convnets()
    load_reference_heads()

    import torch.nn as nn

    # fvcore stubs: Registry (build.py) + c2_msra_fill (weight_init_helper)
    if "fvcore" not in sys.modules:
        fv = types.ModuleType("fvcore")
        fv_c = types.ModuleType("fvcore.common")
        fv_reg = types.ModuleType("fvcore.common.registry")

        class Registry:
            def __init__(self, name):
                self._name, self._map = name, {}

            def register(self, obj=None):
                def deco(cls):
                    self._map[cls.__name__] = cls
                    return cls

                return deco(obj) if obj is not None else deco

            def get(self, name):
                return self._map[name]

        fv_reg.Registry = Registry
        fv_n = types.ModuleType("fvcore.nn")
        fv_wi = types.ModuleType("fvcore.nn.weight_init")

        def c2_msra_fill(module):
            nn.init.kaiming_normal_(
                module.weight, mode="fan_out", nonlinearity="relu")
            if module.bias is not None:
                nn.init.constant_(module.bias, 0.0)

        fv_wi.c2_msra_fill = c2_msra_fill
        fv_c.registry = fv_reg
        fv_n.weight_init = fv_wi
        fv.common, fv.nn = fv_c, fv_n
        for k, v in [("fvcore", fv), ("fvcore.common", fv_c),
                     ("fvcore.common.registry", fv_reg), ("fvcore.nn", fv_n),
                     ("fvcore.nn.weight_init", fv_wi)]:
            sys.modules[k] = v

    # slowfast.utils package: real distributed.py, stub logging
    if "slowfast.utils" not in sys.modules:
        sys.modules["slowfast.utils"] = types.ModuleType("slowfast.utils")
    utils_pkg = sys.modules["slowfast.utils"]
    if "slowfast.utils.logging" not in sys.modules:
        lg = types.ModuleType("slowfast.utils.logging")
        import logging as _pylogging

        lg.get_logger = lambda name: _pylogging.getLogger(name)
        sys.modules["slowfast.utils.logging"] = lg
        utils_pkg.logging = lg
    if "slowfast.utils.distributed" not in sys.modules:
        du = _load("slowfast.utils.distributed",
                   "/root/reference/slowfast/utils/distributed.py")
        utils_pkg.distributed = du
    mu = _load("slowfast.models.utils", f"{REF}/utils.py")
    sys.modules["slowfast.models"].utils = mu
    wih = _load("slowfast.utils.weight_init_helper",
                "/root/reference/slowfast/utils/weight_init_helper.py")
    utils_pkg.weight_init_helper = wih
    bnh = _load("slowfast.models.batchnorm_helper",
                f"{REF}/batchnorm_helper.py")
    sys.modules["slowfast.models"].batchnorm_helper = bnh
    tm = _load("slowfast.models.text_models", f"{REF}/text_models.py")
    sys.modules["slowfast.models"].text_models = tm
    bld = _load("slowfast.models.build", f"{REF}/build.py")
    sys.modules["slowfast.models"].build = bld
    # attach siblings for `from . import head_helper, resnet_helper, ...`
    pkg = sys.modules["slowfast.models"]
    pkg.head_helper = sys.modules["slowfast.models.head_helper"]
    pkg.resnet_helper = sys.modules["slowfast.models.resnet_helper"]
    pkg.stem_helper = sys.modules["slowfast.models.stem_helper"]
    pkg.attention = sys.modules["slowfast.models.attention"]
    pkg.__path__ = [REF]
    sys.modules["slowfast"].__path__ = ["/root/reference/slowfast"]
    utils_pkg.__path__ = ["/root/reference/slowfast/utils"]
    return _load("slowfast.models.video_model_builder",
                 f"{REF}/video_model_builder.py")


def torch_to_numpy(t):
    return t.detach().cpu().numpy()
