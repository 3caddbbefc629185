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


def torch_to_numpy(t):
    return t.detach().cpu().numpy()
