"""KV cache with optional int8 quantization.

The serving-side component the reference delegates to ORT (SURVEY.md §2B,
"inference engine" row): static-shape per-layer K/V buffers sized
``(L, B, S_max, H_kv, D)`` so every decode step reuses one compiled program.

Int8 mode quantizes per (token, head) with a symmetric abs-max scale on write
(``k_scale`` ``(L, B, S_max, H_kv)``) and dequantizes on read — attention math
stays in the model dtype while the cache holds 1 byte/element + scale, a 3.5x
HBM saving over f32 that directly lifts decode throughput (decode is
bandwidth-bound on the cache reads).

Functional: every write returns a new cache pytree (donated under jit).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

__all__ = ["KVCacheConfig", "QuantizedKV", "init_cache", "write_kv", "read_kv",
           "read_kv_quantized"]


@dataclasses.dataclass
class QuantizedKV:
    """A layer's int8 K/V cache view, consumed without dequantization.

    ``use_kernel=True`` routes decode steps to the fused flash-decode Pallas
    kernel (``ops/kernels/flash_decode.py``); otherwise the model runs the
    scale-folded XLA attend: K/V enter the einsums as raw int8 casts (which
    XLA fuses into the dot reads) and the per-(token, head) scales apply to
    the score columns / attention weights — no dequantized (B, S, H, D)
    cache array ever exists."""

    k: Any  # (B, S, H_kv, D) int8
    v: Any
    k_scale: Any  # (B, S, H_kv) f32
    v_scale: Any
    use_kernel: bool = False


@dataclasses.dataclass(frozen=True)
class KVCacheConfig:
    num_layers: int
    batch: int
    max_seq: int
    num_kv_heads: int
    head_dim: int
    quantized: bool = False  # int8 cache
    dtype: Any = jnp.float32


def init_cache(cfg: KVCacheConfig) -> dict:
    shape = (cfg.num_layers, cfg.batch, cfg.max_seq, cfg.num_kv_heads, cfg.head_dim)
    if cfg.quantized:
        cache = {
            "k": jnp.zeros(shape, jnp.int8),
            "v": jnp.zeros(shape, jnp.int8),
            "k_scale": jnp.zeros(shape[:-1], jnp.float32),
            "v_scale": jnp.zeros(shape[:-1], jnp.float32),
        }
    else:
        cache = {"k": jnp.zeros(shape, cfg.dtype), "v": jnp.zeros(shape, cfg.dtype)}
    cache["lengths"] = jnp.zeros((cfg.batch,), jnp.int32)
    return cache


def _quantize_sym(x):
    """Per (token, head) symmetric int8: scale = absmax / 127.

    The division/round run in f32 regardless of the activation dtype — with a
    bf16 stream the 8-bit mantissa would cost ~0.4% extra quantization error.
    """
    x32 = x.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(x32), axis=-1)
    scale = jnp.where(absmax > 0, absmax / 127.0, 1.0)
    q = jnp.clip(jnp.round(x32 / scale[..., None]), -127, 127).astype(jnp.int8)
    return q, scale


def write_kv(cache: dict, layer: int, k, v, positions) -> dict:
    """Write new K/V rows at per-sequence ``positions`` (B, T) for ``layer``.

    k/v: (B, T, H_kv, D). Returns the updated cache.
    """
    quantized = "k_scale" in cache

    def scatter(buf, rows):
        # buf: (L, B, S, H, D) or (L, B, S, H); rows time-indexed by
        # positions (B, T). ONE scatter straight into the 5D buffer — the
        # earlier slice-out/update/slice-in pattern
        # (``buf.at[layer].set(buf[layer].at[...].set(rows))``) compiled to
        # 4.7x slower writes at the 4B shape (round-2 probe
        # ``tpu_probe_kv_parts.py``: 2079 -> 439 us/step over 34 layers).
        # mode="drop": out-of-range positions (sequences at capacity) skip
        # the write instead of clamping onto the last slot.
        B = rows.shape[0]
        batch_idx = jnp.arange(B)[:, None]
        return buf.at[layer, batch_idx, positions].set(
            rows.astype(buf.dtype), mode="drop"
        )

    new = dict(cache)
    if quantized:
        kq, ks = _quantize_sym(k)
        vq, vs = _quantize_sym(v)
        new["k"] = scatter(cache["k"], kq)
        new["v"] = scatter(cache["v"], vq)
        new["k_scale"] = scatter(cache["k_scale"], ks)
        new["v_scale"] = scatter(cache["v_scale"], vs)
    else:
        new["k"] = scatter(cache["k"], k)
        new["v"] = scatter(cache["v"], v)
    return new


def write_kv_rows(cache: dict, layer: int, k, v, positions, slots):
    """Scatter A new rows' K/V into batch slots ``slots`` (A,) at per-row
    ``positions`` (A, T) — the narrow admission prefill's write: only the
    admitted rows' forward is computed, so k/v are (A, T, H, D) with A <
    max_batch. Out-of-range slots or positions drop (padding rows pass
    ``slots = B``). Returns (cache', quantized-or-plain fresh rows) — the
    fresh rows feed the admission's own attention so it reads NOTHING back
    from the wide cache (and, when quantized, attends over the SAME int8
    values the cache now holds, keeping admission tokens bit-identical to
    the full-batch masked prefill)."""
    quantized = "k_scale" in cache

    def scatter(buf, rows):
        A = rows.shape[0]
        row_idx = slots[:, None] * jnp.ones((1, positions.shape[1]), jnp.int32)
        return buf.at[layer, row_idx, positions].set(
            rows.astype(buf.dtype), mode="drop"
        )

    new = dict(cache)
    if quantized:
        kq, ks = _quantize_sym(k)
        vq, vs = _quantize_sym(v)
        new["k"] = scatter(cache["k"], kq)
        new["v"] = scatter(cache["v"], vq)
        new["k_scale"] = scatter(cache["k_scale"], ks)
        new["v_scale"] = scatter(cache["v_scale"], vs)
        fresh = QuantizedKV(k=kq, v=vq, k_scale=ks, v_scale=vs)
    else:
        new["k"] = scatter(cache["k"], k)
        new["v"] = scatter(cache["v"], v)
        fresh = (k, v)
    return new, fresh


def write_kv_window(cache: dict, layer: int, k, v, start, ok) -> dict:
    """Contiguous-window K/V write at per-row offsets (B rows, T columns).

    ``write_kv``'s general scatter lowers to cache traffic proportional to
    S_max when the (B, T) positions are per-row OFFSET windows (measured on
    the 4B speculative verify, round 3: 15.2 ms at S=2048 vs 4.4 ms at
    S=512, and a bf16 cache doubles it — the scatter rewrites the cache, not
    the window). Per-row in-place ``dynamic_update_slice`` costs O(B*T*H*D):
    the same verify drops to decode-step cost.

    ``start``: (B,) int32 window starts; ``ok``: (B,) bool — rows with
    ``ok=False`` keep their window unchanged (the frozen-slot analogue of
    the scatter's mode="drop"; clamped starts never corrupt because the
    old window is blended back).
    """
    quantized = "k_scale" in cache
    B, T = k.shape[:2]
    S = cache["k"].shape[2]
    ok = jnp.logical_and(ok, start + T <= S)

    def upd(buf, rows):
        rows = rows.astype(buf.dtype)
        for b in range(B):  # static: latency-mode batches are small
            s = jnp.clip(start[b], 0, S - T)
            idx = (layer, b, s) + (0,) * (buf.ndim - 3)
            size = (1, 1, T) + buf.shape[3:]
            cur = jax.lax.dynamic_slice(buf, idx, size)
            blend = jnp.where(ok[b], rows[b][None, None], cur)
            buf = jax.lax.dynamic_update_slice(buf, blend, idx)
        return buf

    new = dict(cache)
    if quantized:
        kq, ks = _quantize_sym(k)
        vq, vs = _quantize_sym(v)
        new["k"] = upd(cache["k"], kq)
        new["v"] = upd(cache["v"], vq)
        new["k_scale"] = upd(cache["k_scale"], ks)
        new["v_scale"] = upd(cache["v_scale"], vs)
    else:
        new["k"] = upd(cache["k"], k)
        new["v"] = upd(cache["v"], v)
    return new


def read_kv_quantized(cache: dict, layer: int, use_kernel: bool = False) -> QuantizedKV:
    """The layer's raw int8 K/V + scales (no dequantization, no HBM copy)."""
    return QuantizedKV(
        k=cache["k"][layer], v=cache["v"][layer],
        k_scale=cache["k_scale"][layer], v_scale=cache["v_scale"][layer],
        use_kernel=use_kernel,
    )


def read_kv(cache: dict, layer: int, dtype=jnp.float32):
    """Full (B, S_max, H, D) K/V for ``layer``, dequantized if int8."""
    k = cache["k"][layer]
    v = cache["v"][layer]
    if "k_scale" in cache:
        k = k.astype(dtype) * cache["k_scale"][layer][..., None]
        v = v.astype(dtype) * cache["v_scale"][layer][..., None]
    return k.astype(dtype), v.astype(dtype)
