"""Model registry + builder (reference: slowfast/models/build.py).

``build_model(cfg)`` returns ``(module, params)``: a flax module and its
initialized parameter pytree. There is no DDP wrap — data parallelism comes
from sharding the batch under jit (see parallel/mesh.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..utils.registry import Registry

MODEL_REGISTRY = Registry("MODEL")


def compute_dtypes(cfg):
    compute = jnp.bfloat16 if cfg.TPU.COMPUTE_DTYPE == "bfloat16" else jnp.float32
    param = jnp.bfloat16 if cfg.TPU.PARAM_DTYPE == "bfloat16" else jnp.float32
    return compute, param


def build_module(cfg):
    """Instantiate the flax module named by ``cfg.MODEL.MODEL_NAME``.

    Returns ``(module, example_input)`` where example_input is a minimal
    batch-1 input pytree suitable for ``module.init``.
    """
    from . import zoo  # noqa: F401  (populates the registry)

    builder = MODEL_REGISTRY.get(cfg.MODEL.MODEL_NAME)
    return builder(cfg)


def build_model(cfg, rng: jax.Array | None = None):
    """Build module and initialize parameters. Returns ``(module, params)``.

    For models with extra variable collections (BatchNorm running stats) use
    :func:`build_model_with_state`.
    """
    module, variables = _init_variables(cfg, rng)
    return module, variables["params"]


def build_model_with_state(cfg, rng: jax.Array | None = None):
    """Returns ``(module, params, model_state)`` where model_state holds the
    non-param collections (e.g. ``batch_stats`` -- the reference checkpoint's
    BN running statistics)."""
    module, variables = _init_variables(cfg, rng)
    variables = dict(variables)
    params = variables.pop("params")
    return module, params, variables


def _init_variables(cfg, rng):
    """flax ``lazy_init``: parameter initializers run concretely but the
    forward computation is traced abstractly, so init never executes the
    (expensive-to-compile) Pallas kernels or a full forward pass.

    Initializers run on host CPU -- tiny per-op dispatches over the device
    tunnel would dominate otherwise -- then transfer once.
    """
    from ..utils.env import setup_environment
    from ..ops.pallas import flash_attention as fa

    setup_environment()
    module, example_input = build_module(cfg)
    if rng is None:
        rng = jax.random.PRNGKey(cfg.RNG_SEED)
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu), fa.disabled():
        # convention: a tuple example means multiple positional args
        # (e.g. ActionCLIP's (frames, tokens)); a list is one pathway arg
        if isinstance(example_input, tuple):
            variables = module.lazy_init({"params": rng}, *example_input)
        else:
            variables = module.lazy_init({"params": rng}, example_input)
    variables = dict(variables)
    if jax.default_backend() != "cpu":
        variables = jax.device_put(variables, jax.devices()[0])
    return module, variables
