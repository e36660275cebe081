"""Rotation pre-pass: fold a random orthogonal basis change into the weights.

An extension beyond the reference's pre-pass set (SmoothQuant/AWQ — see
``/root/reference/src/onnx_quantize/pre_passes``): the QuaRot/SpinQuant
family's core move. The decoder's residual stream is rewritten in a rotated
basis ``x̃ = x R`` (R orthogonal): the embedding and every stream-writing
projection fold ``R`` on the right, every stream-reading projection folds
``Rᵀ`` on the left, and the model computes EXACTLY the same logits — matmul
associativity, no runtime cost, nothing online. What changes is the
representation: a rotation spreads outlier channels (the thing that blows up
low-bit scales) across the whole hidden dimension, making both weights and
activations dramatically easier to quantize. Randomized Hadamard rotations
give near-optimal incoherence with an O(n log n) structure (we never exploit
the fast transform — the fold is one-off host math — but Hadamard's ±1
entries mix every pair of channels with equal weight).

RMSNorm commutes with rotation only when its gain is 1 (``‖xR‖ = ‖x‖``, but a
per-channel gain re-introduces a preferred basis), so each norm's gain is
first folded into the projections it feeds (``W ← D_γ W``) and the norm reset
to identity — the standard QuaRot "fuse then rotate" preparation. Models with
sandwich (post-) norms are rejected: a post-norm's gain feeds the residual
add directly, with no following matmul to absorb it (Gemma-3's default
config; use ``sandwich_norms=False`` conventions — Llama/Qwen/Mixtral).

Composition order: rotation must run BEFORE SmoothQuant (an elementwise
prescale in the un-rotated basis does not commute with R; the pass raises if
it finds one). Captured calibration inputs on stream-reading sites are
updated in place, so a following AWQ/SmoothQuant pass calibrates in the
rotated basis, and ``requires_post_calibration`` re-runs static activation
calibration on the rotated model.
"""

from __future__ import annotations

from typing import Literal

import numpy as np

from onnx_quantize_tpu._logging import get_logger
from onnx_quantize_tpu.core.qconfig import (
    PreProcessingConfig,
    QConfig,
    register_preprocessing_config,
)
from onnx_quantize_tpu.plan import QuantPlan

logger = get_logger(__name__)

__all__ = ["RotateConfig", "RotatePass", "random_orthogonal",
           "randomized_hadamard", "rotate_residual_stream"]


def random_orthogonal(n: int, rng: np.random.Generator) -> np.ndarray:
    """Haar-ish random orthogonal matrix (QR with sign-fixed diagonal)."""
    a = rng.standard_normal((n, n))
    q, r = np.linalg.qr(a)
    return q * np.sign(np.diag(r))[None, :]


def _hadamard(k: int) -> np.ndarray:
    h = np.ones((1, 1))
    for _ in range(k):
        h = np.block([[h, h], [h, -h]])
    return h


def randomized_hadamard(n: int, rng: np.random.Generator) -> np.ndarray:
    """Orthogonal ``D · (H_{2^a} ⊗ Q_m)`` for ``n = 2^a · m`` (m odd).

    D is a random ±1 diagonal (the "randomized" part — kills adversarial
    alignment with the fixed Hadamard pattern); the odd factor gets a random
    orthogonal block so any hidden size works. Falls back to a plain random
    orthogonal when n is odd.
    """
    a = 0
    m = n
    while m % 2 == 0:
        a += 1
        m //= 2
    if a == 0:
        return random_orthogonal(n, rng)
    h = _hadamard(a) / np.sqrt(2.0**a)
    block = h if m == 1 else np.kron(h, random_orthogonal(m, rng))
    signs = rng.integers(0, 2, size=n) * 2.0 - 1.0
    return signs[:, None] * block


def _gain(norm_params: dict, one_plus: bool) -> np.ndarray:
    w = np.asarray(norm_params["w"], np.float64)
    return 1.0 + w if one_plus else w


def _reset_norm(norm_params: dict, one_plus: bool) -> None:
    w = norm_params["w"]
    norm_params["w"] = (np.zeros_like(w) if one_plus else np.ones_like(w))


def _read_fold(site: dict, rot_t: np.ndarray, gamma: np.ndarray | None) -> None:
    """Stream-reading site: ``W ← Rᵀ D_γ W`` (bias lives in head space).

    INVARIANT: both fold helpers REBIND ``site["w"]`` (fresh array) and never
    mutate in place. Tied-lm_head models depend on this: the lm_head site
    holds a *view* of the embedding buffer, and folding it last must still
    read the pre-fold embedding values. An in-place ``w *= ...`` here would
    silently double-rotate tied models.
    """
    if "prescale" in site:
        raise ValueError(
            "rotation must run before SmoothQuant: found a prescale on a "
            "stream-reading site (order preprocessors=[RotateConfig(), ...])"
        )
    w = np.asarray(site["w"])
    left = rot_t * gamma[None, :] if gamma is not None else rot_t
    site["w"] = (left @ w.astype(np.float64)).astype(w.dtype)


def _write_fold(site: dict, rot: np.ndarray) -> None:
    """Stream-writing site: ``W ← W R``, ``b ← b R``."""
    w = np.asarray(site["w"])
    site["w"] = (w.astype(np.float64) @ rot).astype(w.dtype)
    if "b" in site:
        b = np.asarray(site["b"])
        site["b"] = (b.astype(np.float64) @ rot).astype(b.dtype)


def _mlp_paths(mlp_params: dict, prefix: tuple[str, ...]):
    """(reading gate/up paths, writing down paths) for a dense or MoE MLP."""
    readers, writers = [], []
    if "router" in mlp_params:  # MoE: router + every expert + shared pair
        readers.append(prefix + ("router",))
        subs = [k for k in mlp_params if k.startswith("experts.")]
        for k in subs:
            readers += [prefix + (k, "gate_proj"), prefix + (k, "up_proj")]
            writers.append(prefix + (k, "down_proj"))
        if "shared" in mlp_params:
            readers += [
                prefix + ("shared_gate",),
                prefix + ("shared", "gate_proj"),
                prefix + ("shared", "up_proj"),
            ]
            writers.append(prefix + ("shared", "down_proj"))
    else:
        readers += [prefix + ("gate_proj",), prefix + ("up_proj",)]
        writers.append(prefix + ("down_proj",))
    return readers, writers


def _tree_get(params: dict, path: tuple[str, ...]) -> dict:
    node = params
    for key in path:
        node = node[key]
    return node


def rotate_residual_stream(model, params: dict, rotation: np.ndarray
                           ) -> dict[tuple[str, ...], np.ndarray | None]:
    """Fold ``rotation`` into ``params`` in place (exact logits).

    Returns {stream-reading site path: pre-fold norm gain or None} — the
    recipe for transforming that site's captured calibration inputs
    (``new = (old / γ) @ R``).
    """
    from onnx_quantize_tpu.models.gemma3 import Gemma3

    if not isinstance(model, Gemma3):
        raise ValueError("rotation supports the Gemma3-family decoder "
                         "(Gemma/Llama/Qwen/MoE configs)")
    cfg = model.cfg
    if cfg.sandwich_norms:
        raise ValueError(
            "rotation requires pre-norm-only models (sandwich_norms=False): "
            "a post-norm gain feeds the residual add with no following "
            "matmul to absorb it"
        )
    n = cfg.hidden_size
    if rotation.shape != (n, n):
        raise ValueError(f"rotation must be ({n}, {n}), got {rotation.shape}")
    rot = rotation.astype(np.float64)
    rot_t = rot.T
    one_plus = cfg.rms_one_plus
    gains: dict[tuple[str, ...], np.ndarray | None] = {}

    embed = params["embed"]
    w = np.asarray(embed["w"])
    embed["w"] = (w.astype(np.float64) @ rot).astype(w.dtype)

    for i in range(cfg.num_layers):
        layer = params[f"layers.{i}"]
        g_attn = _gain(layer["input_norm"], one_plus)
        for proj in ("q_proj", "k_proj", "v_proj"):
            path = (f"layers.{i}", "attn", proj)
            _read_fold(_tree_get(params, path), rot_t, g_attn)
            gains[path] = g_attn
        _reset_norm(layer["input_norm"], one_plus)
        _write_fold(layer["attn"]["o_proj"], rot)

        g_ffn = _gain(layer["pre_ffn_norm"], one_plus)
        readers, writers = _mlp_paths(layer["mlp"], (f"layers.{i}", "mlp"))
        for path in readers:
            _read_fold(_tree_get(params, path), rot_t, g_ffn)
            gains[path] = g_ffn
        for path in writers:
            _write_fold(_tree_get(params, path), rot)
        _reset_norm(layer["pre_ffn_norm"], one_plus)

    g_final = _gain(params["final_norm"], one_plus)
    _read_fold(params["lm_head"], rot_t, g_final)
    gains[("lm_head",)] = g_final
    _reset_norm(params["final_norm"], one_plus)
    return gains


@register_preprocessing_config
class RotateConfig(PreProcessingConfig):
    """Rotation parameters: basis construction and seed."""

    preprocessing_type: Literal["rotate"] = "rotate"
    mode: Literal["hadamard", "random"] = "hadamard"
    seed: int = 0

    # The rotation itself is data-free; post-calibration (inherited True)
    # re-derives static activation ranges in the rotated basis.
    requires_calibration = False

    def build_pass(self, qconfig: QConfig) -> "RotatePass":
        return RotatePass(mode=self.mode, seed=self.seed)


class RotatePass:
    """In-place param/plan pass folding the rotation into the model."""

    def __init__(self, mode: str = "hadamard", seed: int = 0):
        self.mode = mode
        self.seed = seed

    def __call__(self, model, params: dict, plan: QuantPlan, qconfig: QConfig) -> bool:
        n = model.cfg.hidden_size
        rng = np.random.default_rng(self.seed)
        rot = (randomized_hadamard(n, rng) if self.mode == "hadamard"
               else random_orthogonal(n, rng))
        gains = rotate_residual_stream(model, params, rot)
        # Captured calibration inputs on stream-reading sites move to the
        # rotated basis so later passes (AWQ/SmoothQuant) see what the
        # rotated model will actually see. γ==0 channels carried no signal.
        updated = 0
        for entry in plan:
            g = gains.get(entry.site.param_path, False)
            if g is False or entry.captured_input is None:
                continue
            u = entry.captured_input.astype(np.float64)
            if g is not None:
                g_safe = np.where(g != 0.0, g, 1.0)
                u = np.where(g != 0.0, u / g_safe, 0.0)
            entry.captured_input = (u @ rot).astype(np.float32)
            updated += 1
        logger.info(
            "Rotation pass folded a %s basis into %d sites (%d captured "
            "inputs moved to the rotated basis)", self.mode, len(gains), updated,
        )
        return True
