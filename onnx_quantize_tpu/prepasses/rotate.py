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
           "randomized_hadamard", "rotate_residual_stream",
           "hadamard_block", "apply_online_rotations",
           "stamp_online_rotations", "clear_online_rotations"]


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


# ── Online rotations (QuaRot R2/R3/R4) ──────────────────────────────────────
#
# R1 (above) is weight-space and free. Three more rotations cover the places
# R1 cannot reach, targeting KV-cache and activation quantization:
#
# * R2 — V head space: fold ``R_v`` into v_proj's output columns and
#   ``R_vᵀ`` into o_proj's input rows, PER HEAD. Weight-space (nothing
#   online), but the engine's cached V rows are now rotated, so int8/int4 KV
#   quantizes an outlier-spread tensor.
# * R3 — Q/K post-RoPE: RoPE sits between k_proj and the attention dot, so a
#   K-side basis change cannot be folded; ``Gemma3Attention.qk_rot`` applies
#   the SAME per-head orthogonal transform to q and k ONLINE after RoPE
#   (scores exactly invariant: (qR)(kR)ᵀ = qkᵀ). The cached K rows are
#   rotated. Cost: one (head_dim, head_dim) einsum per q/k — O(d_h/hidden)
#   relative to the projections themselves.
# * R4 — down_proj input: the GeGLU/SwiGLU output is the canonical
#   activation-outlier site. ``Gemma3MLP.down_rot`` applies a BLOCKWISE
#   Hadamard (size ``block``, default 128) to the down input online, with
#   ``Hᵀ`` folded into down_proj's weight rows — exact, and the per-block
#   mixing matches the group-quant scale granularity. Cost: one
#   (inter/block, block, block) einsum — ~block/hidden of the down matmul.
#
# All transforms are seeded-deterministic, so they can be re-stamped onto a
# freshly built model after a checkpoint reload (``stamp_online_rotations``).


def hadamard_block(dim: int, rng: np.random.Generator) -> np.ndarray:
    """Sign-randomized orthogonal mixer for one block: ``D·H/√dim`` when dim
    is a power of two, else a random orthogonal matrix."""
    if dim & (dim - 1) == 0:
        h = _hadamard(dim.bit_length() - 1) / np.sqrt(float(dim))
        signs = rng.integers(0, 2, size=dim) * 2.0 - 1.0
        return signs[:, None] * h
    return random_orthogonal(dim, rng)


def _build_online_rots(cfg, block: int, seed: int, need_down: bool = True):
    """Deterministic (r_qk, r_v, h_down) from config shapes + seed."""
    rng = np.random.default_rng(seed + 1)  # offset from R1's stream
    r_qk = hadamard_block(cfg.head_dim, rng)
    r_v = hadamard_block(cfg.head_dim, rng)
    if not need_down:
        return r_qk, r_v, None
    block = min(block, cfg.intermediate_size)
    if cfg.intermediate_size % block != 0:
        raise ValueError(
            f"online down rotation needs block ({block}) to divide "
            f"intermediate_size ({cfg.intermediate_size})"
        )
    h_down = hadamard_block(block, rng)
    return r_qk, r_v, h_down


def _fold_cols_per_head(site: dict, rot: np.ndarray, head_dim: int) -> None:
    """Output-side per-head fold: ``W[:, h] ← W[:, h] R`` (v_proj)."""
    w = np.asarray(site["w"])
    n_in, n_out = w.shape
    w3 = w.astype(np.float64).reshape(n_in, n_out // head_dim, head_dim)
    site["w"] = (w3 @ rot).reshape(n_in, n_out).astype(w.dtype)
    if "b" in site:
        b = np.asarray(site["b"])
        b2 = b.astype(np.float64).reshape(n_out // head_dim, head_dim)
        site["b"] = (b2 @ rot).reshape(n_out).astype(b.dtype)


def _fold_rows_per_head(site: dict, rot_t: np.ndarray, head_dim: int) -> None:
    """Input-side per-head fold: ``W[h, :] ← Rᵀ W[h, :]`` (o_proj)."""
    w = np.asarray(site["w"])
    n_in, n_out = w.shape
    w3 = w.astype(np.float64).reshape(n_in // head_dim, head_dim, n_out)
    site["w"] = np.einsum("hd,ndo->nho", rot_t, w3).reshape(n_in, n_out).astype(w.dtype)


def _fold_rows_blockwise(site: dict, h_t: np.ndarray, block: int) -> None:
    """Input-side blockwise fold: per ``block`` of rows, ``W_g ← Hᵀ W_g``."""
    w = np.asarray(site["w"])
    n_in, n_out = w.shape
    w3 = w.astype(np.float64).reshape(n_in // block, block, n_out)
    site["w"] = np.einsum("bd,ndo->nbo", h_t, w3).reshape(n_in, n_out).astype(w.dtype)


def _rotate_captured_blockwise(u: np.ndarray, rot: np.ndarray, block: int
                               ) -> np.ndarray:
    n = u.shape[-1]
    u3 = u.astype(np.float64).reshape(*u.shape[:-1], n // block, block)
    return (u3 @ rot).reshape(u.shape).astype(np.float32)


def stamp_online_rotations(model, *, qk: bool = True, down: bool = True,
                           block: int = 128, seed: int = 0) -> None:
    """Stamp the runtime transforms onto a model whose params were ALREADY
    folded (e.g. after a checkpoint reload). Deterministic in (shapes, seed).
    R2 (V) is purely weight-space — nothing to stamp for it.
    """
    cfg = model.cfg
    r_qk, _, h_down = _build_online_rots(cfg, block, seed, need_down=down)
    for block_mod in model.blocks:
        if qk:
            block_mod.attn.qk_rot = r_qk
        if down:
            mlp = block_mod.mlp
            if not hasattr(mlp, "down_proj"):
                raise NotImplementedError(
                    "online down rotation supports dense MLPs only (MoE "
                    "experts would each need the online transform inside "
                    "their routed execution)"
                )
            mlp.down_rot = h_down


def clear_online_rotations(model) -> None:
    """Remove stamped online transforms. The stamp is MODEL state paired with
    the folded params produced alongside it (like ``tp_localize``): reuse of
    one model object across differently-configured ``quantize()`` calls must
    clear (or re-stamp) between them, or the online transform would run
    against un-folded weights."""
    for block_mod in model.blocks:
        block_mod.attn.qk_rot = None
        if hasattr(block_mod.mlp, "down_rot"):
            block_mod.mlp.down_rot = None


def apply_online_rotations(model, params: dict, plan=None, *, qk: bool = True,
                           v: bool = True, down: bool = True,
                           block: int = 128, seed: int = 0) -> None:
    """Fold the weight-space halves of R2/R3/R4 into ``params`` (in place)
    and stamp the online transforms onto ``model``. Exact logits.

    ``plan`` (optional QuantPlan): captured calibration inputs on o_proj /
    down_proj are moved into the rotated basis so later passes calibrate on
    what the runtime will actually see.
    """
    from onnx_quantize_tpu.models.gemma3 import Gemma3

    if not isinstance(model, Gemma3):
        raise ValueError("online rotations support the Gemma3-family decoder")
    cfg = model.cfg
    if down and any(not hasattr(b.mlp, "down_proj") for b in model.blocks):
        raise NotImplementedError(
            "online down rotation supports dense MLPs only; pass "
            "rotate_down=False for MoE models"
        )
    r_qk, r_v, h_down = _build_online_rots(cfg, block, seed, need_down=down)
    hd = cfg.head_dim

    captured: dict[tuple[str, ...], tuple[np.ndarray, int]] = {}
    for i in range(cfg.num_layers):
        layer = params[f"layers.{i}"]
        if v:
            _fold_cols_per_head(layer["attn"]["v_proj"], r_v, hd)
            _fold_rows_per_head(layer["attn"]["o_proj"], r_v.T, hd)
            captured[(f"layers.{i}", "attn", "o_proj")] = (r_v, hd)
        if down:
            _fold_rows_blockwise(layer["mlp"]["down_proj"], h_down.T,
                                 h_down.shape[0])
            captured[(f"layers.{i}", "mlp", "down_proj")] = (
                h_down, h_down.shape[0]
            )
    stamp_online_rotations(model, qk=qk, down=down, block=block, seed=seed)

    if plan is not None:
        updated = 0
        for entry in plan:
            rec = captured.get(entry.site.param_path)
            if rec is None or entry.captured_input is None:
                continue
            rot, blk = rec
            entry.captured_input = _rotate_captured_blockwise(
                entry.captured_input, rot, blk
            )
            updated += 1
        if updated:
            logger.info(
                "Online rotation moved %d captured inputs to the rotated "
                "basis", updated,
            )


@register_preprocessing_config
class RotateConfig(PreProcessingConfig):
    """Rotation parameters: basis construction and seed."""

    preprocessing_type: Literal["rotate"] = "rotate"
    mode: Literal["hadamard", "random"] = "hadamard"
    seed: int = 0
    # Online rotations (QuaRot R2/R3/R4, see module block comment above):
    # rotate_qk applies the per-head online transform to q/k post-RoPE (K
    # cache rotated), rotate_v folds the V head-space rotation (V cache
    # rotated, weight-space), rotate_down applies the blockwise online
    # Hadamard on the down_proj input (activation-int8 outlier relief).
    rotate_qk: bool = False
    rotate_v: bool = False
    rotate_down: bool = False
    online_block: int = 128

    # The rotation itself is data-free; post-calibration (inherited True)
    # re-derives static activation ranges in the rotated basis.
    requires_calibration = False

    def build_pass(self, qconfig: QConfig) -> "RotatePass":
        return RotatePass(mode=self.mode, seed=self.seed,
                          rotate_qk=self.rotate_qk, rotate_v=self.rotate_v,
                          rotate_down=self.rotate_down,
                          online_block=self.online_block)


class RotatePass:
    """In-place param/plan pass folding the rotation into the model."""

    def __init__(self, mode: str = "hadamard", seed: int = 0,
                 rotate_qk: bool = False, rotate_v: bool = False,
                 rotate_down: bool = False, online_block: int = 128):
        self.mode = mode
        self.seed = seed
        self.rotate_qk = rotate_qk
        self.rotate_v = rotate_v
        self.rotate_down = rotate_down
        self.online_block = online_block

    def __call__(self, model, params: dict, plan: QuantPlan, qconfig: QConfig) -> bool:
        n = model.cfg.hidden_size
        rng = np.random.default_rng(self.seed)
        rot = (randomized_hadamard(n, rng) if self.mode == "hadamard"
               else random_orthogonal(n, rng))
        gains = rotate_residual_stream(model, params, rot)
        if self.rotate_qk or self.rotate_v or self.rotate_down:
            apply_online_rotations(
                model, params, plan, qk=self.rotate_qk, v=self.rotate_v,
                down=self.rotate_down, block=self.online_block,
                seed=self.seed,
            )
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
