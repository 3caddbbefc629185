"""Classification / projection heads.

Re-designs of `/root/reference/slowfast/models/head_helper.py`:
- TransformerBasicHead (`head_helper.py:369-417`): dropout → linear; the
  activation (softmax/sigmoid) is applied only at eval unless
  ``use_act_in_train`` — training losses operate on logits.
- ContrastiveProjectionHead (`head_helper.py:419-450`): LN(eps=1e-6) →
  linear(no bias) or 2048-hidden MLP.
- TransformerMultiHead (`head_helper.py:464-601`): per-dataset linear heads
  plus optional pairwise cross-dataset projections.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from .common import Mlp, trunc_normal_init


def head_activation(x: jax.Array, act_func: str) -> jax.Array:
    if act_func == "softmax":
        return jax.nn.softmax(x, axis=1)
    if act_func == "sigmoid":
        return jax.nn.sigmoid(x)
    raise NotImplementedError(f"{act_func} is not supported as an activation")


class TransformerBasicHead(nn.Module):
    num_classes: int
    dropout_rate: float = 0.0
    act_func: str = "softmax"
    use_act_in_train: bool = False
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        if self.dropout_rate > 0.0:
            x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        x = nn.Dense(
            self.num_classes,
            kernel_init=trunc_normal_init,
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="projection",
        )(x)
        if self.use_act_in_train or not train:
            x = head_activation(x, self.act_func)
        return x


class ContrastiveProjectionHead(nn.Module):
    dim_out: int
    use_mlp: bool = False
    dropout_rate: float = 0.0
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, deterministic: bool = True) -> jax.Array:
        x = nn.LayerNorm(
            epsilon=1e-6, dtype=self.dtype, param_dtype=self.param_dtype,
            name="norm",
        )(x)
        if self.use_mlp:
            x = Mlp(
                hidden_features=2048,
                out_features=self.dim_out,
                drop_rate=self.dropout_rate,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name="projection",
            )(x, deterministic=deterministic)
        else:
            x = nn.Dense(
                self.dim_out,
                use_bias=False,
                kernel_init=trunc_normal_init,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name="projection",
            )(x)
        return x


class TransformerMultiHead(nn.Module):
    """Per-dataset heads + optional pairwise cross-dataset projections.

    ``__call__`` returns ``{dataset: [B, num_classes]}`` for the requested
    dataset(s); with ``run_cross_proj`` also returns
    ``{(src, dst): [B, num_classes_dst]}`` projections of the src head
    features through a learned linear map (reference: head_helper.py:527-583).
    """

    datasets: Sequence[str]
    num_classes: Sequence[int]
    act_funcs: Sequence[str]
    dropout_rate: float = 0.0
    use_mlp: bool = False
    add_cross_proj: bool = False
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    def _proj(self, name: str, n_cls: int):
        if self.use_mlp:
            return Mlp(
                hidden_features=2048, out_features=n_cls,
                drop_rate=self.dropout_rate, dtype=self.dtype,
                param_dtype=self.param_dtype, name=name,
            )
        return nn.Dense(
            n_cls, kernel_init=trunc_normal_init,
            bias_init=nn.initializers.zeros, dtype=self.dtype,
            param_dtype=self.param_dtype, name=name,
        )

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        dataset_name: str | None = None,
        *,
        run_cross_proj: bool = False,
        train: bool = False,
    ):
        if self.dropout_rate > 0.0 and not self.use_mlp:
            x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)

        names = list(self.datasets) if dataset_name is None else [dataset_name]
        out = {}
        raw = {}  # pre-activation logits feed the cross projections
        for ds in names:
            idx = list(self.datasets).index(ds)
            logits = self._proj(f"head_{ds}", self.num_classes[idx])(x)
            raw[ds] = logits
            if not train:
                logits = head_activation(logits, self.act_funcs[idx])
            out[ds] = logits

        if self.add_cross_proj:
            # "{src}_{dst}" entries merged into the same dict, projecting the
            # src head's logits into the dst class space
            # (reference: head_helper.py:585-601). Params are created even
            # when run_cross_proj is off (init must trace them); unused
            # outputs are dropped below and DCE'd by XLA.
            for i, src in enumerate(self.datasets):
                for j, dst in enumerate(self.datasets):
                    if i == j:
                        continue
                    src_logits = raw.get(src)
                    if src_logits is None:
                        src_logits = self._proj(
                            f"head_{src}", self.num_classes[i])(x)
                    proj = nn.Dense(
                        self.num_classes[j],
                        use_bias=False,
                        kernel_init=trunc_normal_init,
                        dtype=self.dtype,
                        param_dtype=self.param_dtype,
                        name=f"cross_{src}_{dst}",
                    )(src_logits)
                    if run_cross_proj:
                        out[f"{src}_{dst}"] = proj
        return out
