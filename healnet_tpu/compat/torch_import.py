"""Import reference (Torch) HealNet weights into the Flax parameter tree.

Maps the reference ``state_dict`` layout
(`/root/reference/healnet/models/healnet.py:143-185`: ``latents``,
``layers.{L}.{slot}.(norm|norm_context|fn).*``, ``to_logits.{1,2}.*``) onto
:class:`healnet_tpu.models.healnet.HealNetModule` parameters. Used by the
numerical-parity test suite and by users migrating trained checkpoints.

Torch ``nn.Linear`` stores ``weight`` as ``(out, in)``; Flax ``Dense`` kernels
are ``(in, out)`` — transposed here. With weight tying the reference registers
the shared module under every layer, so duplicate entries simply overwrite the
same group parameters with identical values.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np

from healnet_tpu.models.healnet import HealNetModule, _tie_key


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t, dtype=np.float32)


def _linear(state: Mapping, prefix: str, bias: bool = True) -> Dict[str, np.ndarray]:
    out = {"kernel": _np(state[f"{prefix}.weight"]).T}
    if bias and f"{prefix}.bias" in state:
        out["bias"] = _np(state[f"{prefix}.bias"])
    return out


def _layernorm(state: Mapping, prefix: str) -> Dict[str, np.ndarray]:
    return {
        "scale": _np(state[f"{prefix}.weight"]),
        "bias": _np(state[f"{prefix}.bias"]),
    }


def _prenorm_attention(state: Mapping, prefix: str, has_context: bool) -> Dict[str, Any]:
    params: Dict[str, Any] = {
        "norm": _layernorm(state, f"{prefix}.norm"),
        "fn": {
            "to_q": _linear(state, f"{prefix}.fn.to_q", bias=False),
            "to_kv": _linear(state, f"{prefix}.fn.to_kv", bias=False),
            "to_out": _linear(state, f"{prefix}.fn.to_out.0"),
        },
    }
    if has_context:
        params["norm_context"] = _layernorm(state, f"{prefix}.norm_context")
    return params


def _prenorm_ff(state: Mapping, prefix: str) -> Dict[str, Any]:
    return {
        "norm": _layernorm(state, f"{prefix}.norm"),
        "fn": {
            "net_0": _linear(state, f"{prefix}.fn.net.0"),
            "net_2": _linear(state, f"{prefix}.fn.net.2"),
        },
    }


def params_from_torch_state_dict(
    state_dict: Mapping[str, Any], module: HealNetModule
) -> Dict[str, Any]:
    """Convert a reference HealNet ``state_dict`` into Flax params for ``module``."""
    params: Dict[str, Any] = {"latents": _np(state_dict["latents"])}

    n_mod = module.n_modalities
    for layer in range(module.depth):
        key = _tie_key(layer, module.weight_tie_layers)
        for m in range(n_mod):
            attn_prefix = f"layers.{layer}.{2 * m}"
            ff_prefix = f"layers.{layer}.{2 * m + 1}"
            params[f"layer{key}_cross_attn_m{m}"] = _prenorm_attention(
                state_dict, attn_prefix, has_context=True
            )
            ff_name = (
                f"layer{key}_cross_ff_shared"
                if (key >= 1 and module.weight_tie_layers)
                else f"layer{key}_cross_ff_m{m}"
            )
            params[ff_name] = _prenorm_ff(state_dict, ff_prefix)
        for blk in range(module.self_per_cross_attn):
            attn_prefix = f"layers.{layer}.{2 * n_mod}.{2 * blk}"
            ff_prefix = f"layers.{layer}.{2 * n_mod}.{2 * blk + 1}"
            params[f"layer{key}_self_attn_b{blk}"] = _prenorm_attention(
                state_dict, attn_prefix, has_context=False
            )
            params[f"layer{key}_self_ff_b{blk}"] = _prenorm_ff(state_dict, ff_prefix)

    if module.final_classifier_head:
        params["final_norm"] = _layernorm(state_dict, "to_logits.1")
        params["final_head"] = _linear(state_dict, "to_logits.2")
    return params
