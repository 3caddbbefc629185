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


def torch_to_numpy(t):
    return t.detach().cpu().numpy()
