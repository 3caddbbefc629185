"""PyTorch checkpoint → flax parameter conversion.

Converts reference `.pyth` checkpoints (`/root/reference/slowfast/utils/
checkpoint.py:107-139` format: ``{"model_state": state_dict, "epoch", ...}``)
into this framework's flax parameter pytrees. Layout rules:

- Linear:   torch ``[out, in]``          → flax kernel ``[in, out]``
- Conv3d:   torch ``[out, in, kT,kH,kW]``→ flax kernel ``[kT,kH,kW,in,out]``
- depthwise pool conv: torch ``[C, 1, k...]`` → ``[k..., 1, C]``
- LayerNorm weight/bias → scale/bias

Shape-matched partial loading mirrors the reference's fine-tuning semantics
(`checkpoint.py:322-347`): keys whose converted shape mismatches the model's
are skipped (and reported), not fatal.
"""

from __future__ import annotations

import pickle
from typing import Any, Mapping

import numpy as np


def load_torch_checkpoint(path: str) -> dict:
    """Load a .pyth/.pt checkpoint into numpy without needing CUDA.

    Uses torch when available (handles zipfile format); falls back to plain
    pickle for legacy files.
    """
    try:
        import torch

        ckpt = torch.load(path, map_location="cpu", weights_only=False)
    except ImportError:  # pragma: no cover - torch is baked into this image
        with open(path, "rb") as f:
            ckpt = pickle.load(f)
    return ckpt


def state_dict_to_numpy(sd: Mapping[str, Any]) -> dict[str, np.ndarray]:
    out = {}
    for k, v in sd.items():
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        out[k] = np.asarray(v)
    return out


def _set(tree: dict, path: list[str], value: np.ndarray) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def convert_mvit_state_dict(
    sd: Mapping[str, np.ndarray],
) -> dict:
    """Convert a reference-MViT state_dict to this framework's param tree.

    Reference module names are documented at
    `video_model_builder.py:855-1121` and `attention.py:86-446`.
    """
    sd = state_dict_to_numpy(sd)
    params: dict = {}
    skipped: list[str] = []

    for name, w in sd.items():
        # strip DDP prefix if present
        if name.startswith("module."):
            name = name[len("module."):]

        parts = name.split(".")
        if name.startswith("patch_embed.proj."):
            if parts[-1] == "weight":
                _set(params, ["patch_embed", "kernel"], w.transpose(2, 3, 4, 1, 0))
            else:
                _set(params, ["patch_embed", "bias"], w)
        elif name in ("cls_token", "pos_embed", "pos_embed_spatial",
                      "pos_embed_temporal", "pos_embed_class"):
            _set(params, [name], w)
        elif name.startswith("norm."):
            _set(params, ["norm", "scale" if parts[-1] == "weight" else "bias"], w)
        elif name.startswith("head."):
            # TransformerBasicHead: head.projection.{weight,bias}
            # ContrastiveProjectionHead: head.norm.*, head.projection.*
            sub = parts[1]
            leaf = parts[-1]
            if sub == "projection" and len(parts) == 3:
                if leaf == "weight":
                    _set(params, ["head", "projection", "kernel"], w.T)
                else:
                    _set(params, ["head", "projection", "bias"], w)
            elif sub == "norm":
                _set(params, ["head", "norm",
                              "scale" if leaf == "weight" else "bias"], w)
            elif sub == "projection":  # MLP projection: head.projection.fc1.*
                fc = parts[2]
                if leaf == "weight":
                    _set(params, ["head", "projection", fc, "kernel"], w.T)
                else:
                    _set(params, ["head", "projection", fc, "bias"], w)
            else:
                skipped.append(name)
        elif parts[0] == "blocks":
            i = int(parts[1])
            rest = parts[2:]
            base = [f"blocks_{i}"]
            params_path, value = _convert_block_entry(rest, w)
            if params_path is None:
                skipped.append(name)
            else:
                _set(params, base + params_path, value)
        else:
            skipped.append(name)

    return params, skipped


def _convert_block_entry(rest: list[str], w: np.ndarray):
    """Convert one `blocks.{i}.<rest>` entry. Returns (path, value) or (None, None)."""
    leaf = rest[-1]

    def ln(prefix):
        return prefix + ["scale" if leaf == "weight" else "bias"], w

    def dense(prefix):
        return prefix + ["kernel" if leaf == "weight" else "bias"], (
            w.T if leaf == "weight" else w
        )

    head = rest[0]
    if head in ("norm1", "norm2"):
        return ln([head])
    if head == "proj_max_pool":
        return dense(["proj_max_pool"])
    if head == "proj":
        return dense(["proj"])
    if head == "mlp":
        return dense(["mlp", rest[1]])
    if head == "attn":
        sub = rest[1]
        if sub in ("qkv", "proj"):
            return dense(["attn", sub])
        if sub in ("pool_q", "pool_k", "pool_v"):
            # depthwise conv: [C, 1, kT, kH, kW] -> [kT, kH, kW, 1, C]
            return ["attn", sub], w.transpose(2, 3, 4, 1, 0)
        if sub in ("norm_q", "norm_k", "norm_v"):
            return ln(["attn", sub])
    return None, None


_BN_LEAVES = {
    "weight": ("params", "scale"),
    "bias": ("params", "bias"),
    "running_mean": ("stats", "mean"),
    "running_var": ("stats", "var"),
}


def convert_convnet_state_dict(
    sd: Mapping[str, np.ndarray], model_shapes: Mapping[tuple, tuple] | None = None
) -> tuple[dict, dict, list[str]]:
    """Convert a reference conv-net state_dict (SlowFast / ResNet / X3D,
    `video_model_builder.py:108-793` module names) to this framework's
    ``(params, batch_stats)`` trees.

    Layout rules are the same as for MViT plus:

    - BatchNorm ``weight/bias`` → params ``scale/bias`` inside the flax
      BatchNorm wrapper (path ``<name>/bn/…``; the stem's norm is named
      ``norm``); ``running_mean/running_var`` → ``batch_stats`` ``mean/var``.
    - ``sN.pathwayP_stem`` collapses to the flax module ``sN_pathwayP_stem``.
    - 2-D conv kernels ``[O, I, kH, kW]`` are inflated to the model's
      temporal extent by repeat+divide (reference ``checkpoint.py:142-179``),
      using ``model_shapes`` (flat path→shape of the target params) when given.

    Returns ``(params, batch_stats, skipped_names)``.
    """
    import re

    sd = state_dict_to_numpy(sd)
    params: dict = {}
    stats: dict = {}
    skipped: list[str] = []

    for name, w in sd.items():
        if name.startswith("module."):
            name = name[len("module."):]
        parts = name.split(".")
        leaf = parts[-1]
        mods = parts[:-1]
        if not mods:
            skipped.append(name)
            continue

        # sN.pathwayP_stem → single flax module sN_pathwayP_stem
        if (len(mods) >= 2 and re.fullmatch(r"s\d+", mods[0])
                and mods[1].endswith("_stem")):
            mods = [f"{mods[0]}_{mods[1]}"] + mods[2:]

        bn_mod = mods[-1] == "bn" or mods[-1].endswith("_bn")
        if bn_mod:
            if leaf == "num_batches_tracked":
                continue
            if leaf not in _BN_LEAVES:
                skipped.append(name)
                continue
            wrapper = mods[-1]
            if mods[0].endswith("_stem") and wrapper == "bn":
                wrapper = "norm"  # ResNetBasicStem/X3DStem name their norm "norm"
            path = mods[:-1] + [wrapper, "bn"]
            coll, flax_leaf = _BN_LEAVES[leaf]
            _set(params if coll == "params" else stats, path + [flax_leaf], w)
            continue

        if leaf == "bias":
            _set(params, mods + ["bias"], w)
        elif leaf == "weight" and w.ndim == 2:
            _set(params, mods + ["kernel"], w.T)
        elif leaf == "weight" and w.ndim in (4, 5):
            if w.ndim == 4:  # 2-D checkpoint: inflate to the model's kT
                t = 1
                if model_shapes is not None:
                    tgt = model_shapes.get(tuple(mods) + ("kernel",))
                    if tgt is not None and len(tgt) == 5:
                        t = int(tgt[0])
                w = inflate_2d_to_3d(w, t)
            _set(params, mods + ["kernel"], w.transpose(2, 3, 4, 1, 0))
        else:
            skipped.append(name)

    return params, stats, skipped


def load_c2_checkpoint(path: str) -> dict[str, np.ndarray]:
    """Load a caffe2 ``.pkl`` checkpoint into a pytorch-style name→array dict
    (reference ``checkpoint.py:219-287``): read ``blobs``, drop momentum /
    iteration blobs, run every name through the c2 conversion chain."""
    with open(path, "rb") as f:
        ckpt = pickle.load(f, encoding="latin1")
    blobs = ckpt.get("blobs", ckpt)
    convert = get_c2_name_convert_func()
    out = {}
    for name, blob in blobs.items():
        if "momentum" in name or name in ("model_iter", "lr"):
            continue
        if not isinstance(blob, np.ndarray):
            continue
        out[convert(name)] = blob
    return out


def load_cross_proj_weight(cfg, params):
    """Initialize the multi-head cross-dataset projections from word-embedding
    similarity ``.npy`` files (reference: tools/train_net.py:567-617).

    ``MODEL.LOAD_MULTI_PROJ_INIT_FILE`` names a directory of ``d1_d2.npy``
    files holding torch-layout ``[n_dst, n_src]`` weights; ``kinetics`` maps
    to ``kinetics{num_classes}``. Returns a new params tree with
    ``head/cross_{src}_{dst}/kernel`` replaced.
    """
    import os

    datasets = list(cfg.MODEL.MULTI_DATASETS)
    num_classes = list(cfg.MODEL.MULTI_NUM_CLASSES)
    weight_dir = cfg.MODEL.LOAD_MULTI_PROJ_INIT_FILE

    def fname(ds):
        if ds == "kinetics":
            return f"kinetics{num_classes[datasets.index('kinetics')]}"
        return ds

    import jax

    params = jax.tree.map(np.asarray, params)
    head = params["head"]
    n_loaded = 0
    for i, src in enumerate(datasets):
        for j, dst in enumerate(datasets):
            if i == j:
                continue
            key = f"cross_{src}_{dst}"
            if key not in head:
                continue
            path = os.path.join(weight_dir, f"{fname(src)}_{fname(dst)}.npy")
            w = np.load(path)  # torch [n_dst, n_src]
            want = head[key]["kernel"].shape  # flax [n_src, n_dst]
            assert w.T.shape == want, (path, w.shape, want)
            head[key]["kernel"] = w.T.astype(head[key]["kernel"].dtype)
            n_loaded += 1
    return params, n_loaded


def flatten_shapes(model_params) -> dict[tuple, tuple]:
    """Flat path→shape map of a param tree (for conversion-time inflation)."""
    import jax

    return {
        k: tuple(v.shape)
        for k, v in _flatten(jax.tree.map(np.asarray, model_params)).items()
    }


def inflate_2d_to_3d(weight_2d: np.ndarray, time_dim: int) -> np.ndarray:
    """Inflate a 2-D conv kernel to 3-D by temporal repeat + divide
    (reference: checkpoint.py:142-179 inflate_weight).

    torch layout in: ``[O, I, H, W]`` → out ``[O, I, T, H, W]``.
    """
    assert weight_2d.ndim == 4, weight_2d.shape
    w3 = np.repeat(weight_2d[:, :, None], time_dim, axis=2)
    return w3 / float(time_dim)


def get_c2_name_convert_func():
    """caffe2 → pytorch layer-name conversion.

    The FULL sequential rule chain of the reference
    (`c2_model_loading.py:9-120`): every substitution is applied in order
    (the later generic suffix rules finish names the structural rules
    produced). This is required behavior — a caffe2 blob must map to
    exactly the same pytorch name the reference would produce.
    """
    import re

    chain = [
        # non-local blocks: nonlocal_convS_N_* → sS.pathway0_nonlocalN_*
        (r"^nonlocal_conv([0-9]+)_([0-9]+)_(.*)",
         r"s\1.pathway0_nonlocal\2_\3"),
        (r"^(.*)_nonlocal([0-9]+)_(theta)(.*)", r"\1_nonlocal\2.conv_\3\4"),
        (r"^(.*)_nonlocal([0-9]+)_(g)(.*)", r"\1_nonlocal\2.conv_\3\4"),
        (r"^(.*)_nonlocal([0-9]+)_(phi)(.*)", r"\1_nonlocal\2.conv_\3\4"),
        (r"^(.*)_nonlocal([0-9]+)_(out)(.*)", r"\1_nonlocal\2.conv_\3\4"),
        (r"^(.*)_nonlocal([0-9]+)_(bn)_(.*)", r"\1_nonlocal\2.\3.\4"),
        # SlowFast lateral fusion
        (r"^t_pool1_subsample_bn_(.*)", r"s1_fuse.bn.\1"),
        (r"^t_pool1_subsample_(.*)", r"s1_fuse.conv_f2s.\1"),
        (r"^t_res([0-9]+)_([0-9]+)_branch2c_bn_subsample_bn_(.*)",
         r"s\1_fuse.bn.\3"),
        (r"^t_res([0-9]+)_([0-9]+)_branch2c_bn_subsample_(.*)",
         r"s\1_fuse.conv_f2s.\3"),
        # slow-pathway residual blocks + stem
        (r"^res([0-9]+)_([0-9]+)_branch([0-9]+)([a-z])_(.*)",
         r"s\1.pathway0_res\2.branch\3.\4_\5"),
        (r"^res_conv1_bn_(.*)", r"s1.pathway0_stem.bn.\1"),
        (r"^conv1_xy(.*)", r"s1.pathway0_stem.conv_xy\1"),
        (r"^conv1_(.*)", r"s1.pathway0_stem.conv.\1"),
        (r"^res([0-9]+)_([0-9]+)_branch([0-9]+)_(.*)",
         r"s\1.pathway0_res\2.branch\3_\4"),
        (r"^res_conv1_(.*)", r"s1.pathway0_stem.conv.\1"),
        # fast-pathway (t_-prefixed) residual blocks + stem
        (r"^t_res([0-9]+)_([0-9]+)_branch([0-9]+)([a-z])_(.*)",
         r"s\1.pathway1_res\2.branch\3.\4_\5"),
        (r"^t_res_conv1_bn_(.*)", r"s1.pathway1_stem.bn.\1"),
        (r"^t_conv1_(.*)", r"s1.pathway1_stem.conv.\1"),
        (r"^t_res([0-9]+)_([0-9]+)_branch([0-9]+)_(.*)",
         r"s\1.pathway1_res\2.branch\3_\4"),
        (r"^t_res_conv1_(.*)", r"s1.pathway1_stem.conv.\1"),
        # heads (incl. X3D conv_5/lin_5 and SE blocks)
        (r"pred_(.*)", r"head.projection.\1"),
        (r"(.*)b_bn_fc(.*)", r"\1se.fc\2"),
        (r"conv_5(.*)", r"head.conv_5\1"),
        (r"lin_5(.*)", r"head.lin_5\1"),
        # generic BN / weight / bias suffixes (run LAST, finish any name)
        (r"(.*)bn.b\Z", r"\1bn.bias"),
        (r"(.*)bn.s\Z", r"\1bn.weight"),
        (r"(.*)bn.rm\Z", r"\1bn.running_mean"),
        (r"(.*)bn.riv\Z", r"\1bn.running_var"),
        (r"(.*)[\._]b\Z", r"\1.bias"),
        (r"(.*)[\._]w\Z", r"\1.weight"),
    ]

    def convert(name: str) -> str:
        for pat, repl in chain:
            name = re.sub(pat, repl, name)
        return name

    return convert


def _flatten(tree: dict, prefix=()) -> dict[tuple, np.ndarray]:
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flatten(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = v
    return out


def merge_with_model_params(
    converted: dict, model_params, *, strict: bool = False,
    broadcast_leading: bool = False,
):
    """Shape-matched partial merge of converted weights into model params.

    Mirrors the reference's fine-tuning load (`checkpoint.py:322-347`): only
    keys present in the model with matching shapes are replaced. Returns
    (new_params, loaded_keys, mismatched_keys, missing_keys).

    ``broadcast_leading`` tiles a ``[C]`` value to a ``[splits, C]`` target
    (reference ``normal_to_sub_bn``, checkpoint.py:430-465 — loading plain-BN
    running stats into a SubBatchNorm model).
    """
    import jax

    flat_model = _flatten(jax.tree.map(np.asarray, model_params))
    flat_conv = _flatten(converted)

    loaded, mismatched = [], []
    new_flat = dict(flat_model)
    for k, v in flat_conv.items():
        if k in flat_model:
            tgt = flat_model[k].shape
            if (broadcast_leading and v.shape != tgt
                    and len(tgt) == len(v.shape) + 1 and tgt[1:] == v.shape):
                v = np.tile(v[None], (tgt[0],) + (1,) * v.ndim)
            if tgt == v.shape:
                new_flat[k] = v.astype(flat_model[k].dtype)
                loaded.append(k)
            else:
                mismatched.append((k, v.shape, flat_model[k].shape))
        else:
            mismatched.append((k, v.shape, None))
    missing = [k for k in flat_model if k not in flat_conv]

    if strict and (mismatched or missing):
        raise ValueError(
            f"strict load failed: mismatched={mismatched[:5]} missing={missing[:5]}"
        )

    # rebuild nested tree
    tree: dict = {}
    for k, v in new_flat.items():
        _set(tree, list(k), v)
    return tree, loaded, mismatched, missing
