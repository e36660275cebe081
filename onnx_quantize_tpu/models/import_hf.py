"""HuggingFace -> framework weight import for Gemma-3.

Maps ``Gemma3ForCausalLM`` safetensors names onto the framework param tree
(projection weights transpose from HF's ``(out, in)`` to our ``(in, out)``
MatMul layout; RMSNorm gains share the ``(1 + w)`` convention). Reads a local
directory — no network access required.
"""

from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np

from onnx_quantize_tpu._logging import get_logger

logger = get_logger(__name__)

__all__ = ["load_gemma3_hf"]


def _read_safetensors(directory: str) -> dict[str, np.ndarray]:
    """Load all safetensors shards in a directory into one dict."""
    try:
        from safetensors.numpy import load_file
    except ImportError as exc:  # pragma: no cover
        raise ImportError(
            "safetensors is required to import HF weights: pip install safetensors"
        ) from exc

    tensors: dict[str, np.ndarray] = {}
    for fname in sorted(os.listdir(directory)):
        if fname.endswith(".safetensors"):
            tensors.update(load_file(os.path.join(directory, fname)))
    if not tensors:
        raise FileNotFoundError(f"No .safetensors files found in {directory}")
    return tensors


def load_gemma3_hf(model, directory: str, dtype=jnp.float32) -> dict:
    """Build the framework param tree from a local HF Gemma-3 checkpoint dir."""
    hf = _read_safetensors(directory)

    def get(name: str) -> np.ndarray:
        for candidate in (name, f"model.{name}", name.replace("model.", "")):
            if candidate in hf:
                return np.asarray(hf[candidate])
        raise KeyError(f"HF tensor {name!r} not found; have e.g. {list(hf)[:5]}")

    def proj(name: str):
        return jnp.asarray(get(name).T, dtype=dtype)  # (out,in) -> (in,out)

    cfg = model.cfg
    params: dict = {
        "embed": {"w": jnp.asarray(get("model.embed_tokens.weight"), dtype=dtype)},
        "final_norm": {"w": jnp.asarray(get("model.norm.weight"), dtype=dtype)},
    }

    for i in range(cfg.num_layers):
        prefix = f"model.layers.{i}"
        params[f"layers.{i}"] = {
            "attn": {
                "q_proj": {"w": proj(f"{prefix}.self_attn.q_proj.weight")},
                "k_proj": {"w": proj(f"{prefix}.self_attn.k_proj.weight")},
                "v_proj": {"w": proj(f"{prefix}.self_attn.v_proj.weight")},
                "o_proj": {"w": proj(f"{prefix}.self_attn.o_proj.weight")},
                "q_norm": {"w": jnp.asarray(get(f"{prefix}.self_attn.q_norm.weight"), dtype=dtype)},
                "k_norm": {"w": jnp.asarray(get(f"{prefix}.self_attn.k_norm.weight"), dtype=dtype)},
            },
            "mlp": {
                "gate_proj": {"w": proj(f"{prefix}.mlp.gate_proj.weight")},
                "up_proj": {"w": proj(f"{prefix}.mlp.up_proj.weight")},
                "down_proj": {"w": proj(f"{prefix}.mlp.down_proj.weight")},
            },
            "input_norm": {"w": jnp.asarray(get(f"{prefix}.input_layernorm.weight"), dtype=dtype)},
            "post_attn_norm": {
                "w": jnp.asarray(get(f"{prefix}.post_attention_layernorm.weight"), dtype=dtype)
            },
            "pre_ffn_norm": {
                "w": jnp.asarray(get(f"{prefix}.pre_feedforward_layernorm.weight"), dtype=dtype)
            },
            "post_ffn_norm": {
                "w": jnp.asarray(get(f"{prefix}.post_feedforward_layernorm.weight"), dtype=dtype)
            },
        }

    # lm_head: tied to the embedding unless the checkpoint carries its own.
    if any("lm_head" in k for k in hf):
        params["lm_head"] = {"w": proj("lm_head.weight")}
    else:
        params["lm_head"] = {"w": params["embed"]["w"].T}
        logger.info("lm_head tied to embedding (no separate HF tensor)")

    missing = [s.name for s in model.linear_sites() if s.name.split(".")[0] not in params
               and s.name not in params]
    if missing:
        logger.warning("Sites without imported weights: %s", missing)
    return params
