"""DiT denoiser backbone in Flax.

A ground-up Flax/XLA re-design of the reference non-causal DiT
(reference: models/dit.py:1095-1500, DDiTBlock 890-1033, Attention 516-887):

  * token embedding over the unified text+image vocab
  * optional timestep embedder -> adaLN-zero 6-way modulation per block,
    gated so only image tokens receive time conditioning
    (modulate_with_mask, reference: models/dit.py:266-268)
  * RMSNorm/LayerNorm (weight-only, fp32), optional QK-norm, optional
    sandwich normalization
  * rotary embeddings: 1D, or 1D-text + 2D-Lumina-image (rope_2d)
  * optional modality embedding
  * zero-initialized final layer (adaLN + logits projection)
  * blocks stacked with nn.scan (single compiled block, fast XLA compile)
    with optional nn.remat for gradient checkpointing
  * AR decode path with an explicit per-layer KV cache carried through scan

Everything is shape-static and jit-friendly. bfloat16 compute / fp32 params
by default; logits are produced in fp32.
"""

from __future__ import annotations

import math
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from unidisc_tpu.config import ModelConfig
from unidisc_tpu.models.rotary import apply_rope, build_multimodal_rope
from unidisc_tpu.ops.attention import multihead_attention
from unidisc_tpu.parallel.seq_parallel import current_seq_mesh as _ring_ctx

Dtype = Any


def _inside_manual_mesh(axis: str) -> bool:
    """True when tracing inside a shard_map that already manualizes
    `axis` (e.g. the GPipe stage body on a seq x pp mesh) — collectives
    over the axis can then be issued directly; a nested shard_map would
    conflict with the manual context mesh."""
    try:
        am = jax.sharding.get_abstract_mesh()
        if am is None or axis not in getattr(am, "axis_names", ()):
            return False
        i = am.axis_names.index(axis)
        return str(am.axis_types[i]) in ("Manual", "AxisType.Manual")
    except Exception:  # noqa: BLE001 — jax-version-dependent introspection
        return False


def torch_linear_init(dtype=jnp.float32):
    """Match torch nn.Linear default: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    def init(key, shape, dtype=dtype):
        fan_in = shape[0]
        bound = 1.0 / math.sqrt(fan_in)
        return jax.random.uniform(key, shape, dtype, -bound, bound)
    return init


def embedding_init(dtype=jnp.float32):
    """Match reference EmbeddingLayer kaiming_uniform(a=sqrt(5)):
    U(-1/sqrt(dim), 1/sqrt(dim)) (reference: models/dit.py:1036-1042)."""
    def init(key, shape, dtype=dtype):
        bound = 1.0 / math.sqrt(shape[-1])
        return jax.random.uniform(key, shape, dtype, -bound, bound)
    return init


class QDense(nn.Module):
    """int8 W8A8 dense for inference (ops/quant.py): per-out-channel int8
    kernel + scale params, dynamic per-token activation quantization,
    int32 MXU accumulation. Params come from quant.quantize_dit_params;
    the init here only fixes shapes/dtypes."""

    features: int
    use_bias: bool = True
    out_dtype: Dtype = jnp.bfloat16
    backend: str = "xla"

    @nn.compact
    def __call__(self, x, prologue=None):
        from unidisc_tpu.ops.quant import qdot
        k = x.shape[-1]
        kernel_q = self.param(
            "kernel_q",
            lambda key, shape: jnp.round(
                torch_linear_init()(key, shape) * 127).astype(jnp.int8),
            (k, self.features))
        scale = self.param("scale",
                           lambda key, shape: jnp.full(shape, 1 / 127.0),
                           (self.features,))
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,)) if self.use_bias else None
        if prologue is not None:
            # fused norm/gelu + quantize + int8 matmul, one VMEM pass
            # (ops/fused_qmm.py); prologue carries the elementwise stage
            # this matmul absorbs
            from unidisc_tpu.ops.fused_qmm import fused_qmm
            lead = x.shape[:-1]
            y = fused_qmm(x.reshape(-1, k), kernel_q, scale, bias=bias,
                          out_dtype=self.out_dtype, **prologue)
            return y.reshape(*lead, self.features)
        return qdot(x, kernel_q, scale, bias=bias, out_dtype=self.out_dtype,
                    backend=self.backend)


def make_dense(cfg: ModelConfig, features: int, *, use_bias: bool,
               dtype, name: str, kernel_init, bias_init=None):
    """nn.Dense, or QDense when cfg.quant == 'int8' (inference)."""
    if cfg.quant == "int8":
        return QDense(features, use_bias=use_bias, out_dtype=dtype,
                      backend=getattr(cfg, "quant_backend", "xla"),
                      name=name)
    kw = dict(use_bias=use_bias, dtype=dtype, kernel_init=kernel_init,
              name=name)
    if use_bias and bias_init is not None:
        kw["bias_init"] = bias_init
    return nn.Dense(features, **kw)


class Norm(nn.Module):
    """Weight-only LayerNorm/RMSNorm computed in fp32
    (reference: models/dit.py:384-404)."""

    dim: int
    norm_type: str = "layernorm"
    compute_dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, *, return_weight=False):
        w = self.param("weight", nn.initializers.ones, (self.dim,))
        if return_weight:
            # fused int8 path (ops/fused_qmm.py): the norm is applied
            # inside the matmul kernel; this call only registers the
            # param (tree layout stays identical to the unfused model)
            return w
        x32 = x.astype(jnp.float32)
        if self.norm_type == "layernorm":
            mean = jnp.mean(x32, axis=-1, keepdims=True)
            var = jnp.var(x32, axis=-1, keepdims=True)
            y = (x32 - mean) * jax.lax.rsqrt(var + 1e-5)
        elif self.norm_type == "rms":
            y = x32 * jax.lax.rsqrt(jnp.mean(x32 ** 2, axis=-1, keepdims=True) + 1e-6)
        else:
            raise ValueError(self.norm_type)
        return (y * w).astype(self.compute_dtype)


class TimestepEmbedder(nn.Module):
    """Sinusoidal timestep embedding -> 2-layer MLP
    (reference: models/dit.py:415-449)."""

    cond_dim: int
    freq_dim: int = 256
    compute_dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, t):
        half = self.freq_dim // 2
        freqs = jnp.exp(-math.log(10_000) * jnp.arange(half, dtype=jnp.float32) / half)
        args = t[:, None].astype(jnp.float32) * freqs[None]
        emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
        emb = nn.Dense(self.cond_dim, kernel_init=torch_linear_init(),
                       bias_init=nn.initializers.zeros, name="mlp_0")(emb)
        emb = nn.silu(emb)
        emb = nn.Dense(self.cond_dim, kernel_init=torch_linear_init(),
                       bias_init=nn.initializers.zeros, name="mlp_2")(emb)
        return emb.astype(self.compute_dtype)


class LabelEmbedder(nn.Module):
    """Class-label embedding with a CFG null slot
    (reference: models/dit.py:452-480 LabelEmbedderCFG)."""

    num_classes: int
    cond_dim: int
    dropout_prob: float = 0.1

    @nn.compact
    def __call__(self, labels, *, rng=None, train=False):
        table = self.param("embedding_table", embedding_init(),
                           (self.num_classes + 1, self.cond_dim))
        if train and self.dropout_prob > 0 and rng is not None:
            drop = jax.random.uniform(rng, labels.shape) < self.dropout_prob
            labels = jnp.where(drop, self.num_classes, labels)
        return jnp.take(table, labels, axis=0)


def modulate(x, shift, scale, modality=None):
    """adaLN modulation; when modality is given, only image tokens (1) are
    modulated (reference: models/dit.py:263-268 modulate_with_mask)."""
    out = x * (1 + scale) + shift
    if modality is None:
        return out
    return jnp.where((modality == 1)[..., None], out, x)


def gate_residual(x_skip, out, gate, modality, *, dropout_fn=None):
    """Residual add with adaLN gate, modality-aware: image tokens get
    gate*dropout(out); text tokens get the raw out when modality is given
    (reference bias_dropout_add_scale, models/dit.py:229-253)."""
    dropped = dropout_fn(out) if dropout_fn is not None else out
    if gate is None:
        return x_skip + dropped
    gated = gate * dropped
    if modality is not None:
        gated = jnp.where((modality == 1)[..., None], gated, out)
    return x_skip + gated


class Attention(nn.Module):
    """Self-attention with rotary, optional QK-norm, optional KV cache
    (reference: models/dit.py:516-887)."""

    cfg: ModelConfig
    compute_dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, rope_cos, rope_sin, attn_mask=None,
                 kv_cache=None, cache_index=None, segment_ids=None,
                 qkv_prologue=None, out_prologue=None, frozen_kv=None):
        c = self.cfg
        h, d = c.n_heads, c.head_dim
        dim = c.hidden_size
        qkv_dense = make_dense(c, 3 * dim, use_bias=False,
                               dtype=self.compute_dtype,
                               kernel_init=torch_linear_init(),
                               name="attn_qkv")
        qkv = qkv_dense(x, qkv_prologue) if qkv_prologue is not None \
            else qkv_dense(x)

        if c.qk_norm:
            # full-width LayerNorm with bias over the q and k slices
            # (reference: models/dit.py:570-572, 655-680)
            q_part = nn.LayerNorm(use_bias=True, dtype=self.compute_dtype,
                                  name="q_norm")(qkv[..., :dim])
            k_part = nn.LayerNorm(use_bias=True, dtype=self.compute_dtype,
                                  name="k_norm")(qkv[..., dim:2 * dim])
            qkv = jnp.concatenate([q_part, k_part, qkv[..., 2 * dim:]], axis=-1)

        b, l = x.shape[0], x.shape[1]
        qkv = qkv.reshape(b, l, 3, h, d)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        q = apply_rope(q, rope_cos, rope_sin)
        k = apply_rope(k, rope_cos, rope_sin)

        new_cache = None
        if kv_cache is not None:
            # Cached decode: write current k/v at cache_index, then attend
            # to the prefix (causal AR decode, reference models/dit.py:588-608)
            # or to the ENTIRE cache (non-causal attention-caching inference:
            # txt queries against live txt + cached img K/V, reference
            # flex KV cache models/dit.py:610-614,784-812).
            # cache_index may be a scalar (all rows in lockstep: AR sampler,
            # attention-caching) or a (B,) vector of PER-ROW positions
            # (continuous batching, serving/continuous.py) — rows at
            # different decode depths share one device batch.
            vector_index = (cache_index is not None
                            and jnp.ndim(cache_index) == 1)

            def write(cache, new):
                if vector_index:
                    return jax.vmap(
                        lambda cr, nr, p: jax.lax.dynamic_update_slice(
                            cr, nr.astype(cr.dtype), (p, 0, 0))
                    )(cache, new, cache_index)
                return jax.lax.dynamic_update_slice(
                    cache, new.astype(cache.dtype), (0, cache_index, 0, 0))

            int8_cache = len(kv_cache) == 4
            if int8_cache:
                # int8 KV cache (ops/quant.py int8_kv_attention): store
                # quantized K/V + per-(pos, head) scales; attention reads
                # the cache in int8 directly
                from unidisc_tpu.ops.quant import quantize_kv
                ckq, cks, cvq, cvs = kv_cache
                k_q, k_s = quantize_kv(k)
                v_q, v_s = quantize_kv(v)
                ckq, cks = write(ckq, k_q), write(cks, k_s)
                cvq, cvs = write(cvq, v_q), write(cvs, v_s)
                new_cache = (ckq, cks, cvq, cvs)
                lk = ckq.shape[1]
            else:
                ck, cv = kv_cache
                ck, cv = write(ck, k), write(cv, v)
                new_cache = (ck, cv)
                lk = ck.shape[1]
            if c.full_attention:
                mask = None
            else:
                # causal WITHIN the new block too (query j attends keys
                # <= index+j), so multi-token prompt prefill is exact
                q_pos = jnp.arange(l)
                if vector_index:
                    key_ok = (jnp.arange(lk)[None, None, :]
                              <= cache_index[:, None, None]
                              + q_pos[None, :, None])      # (B, l, lk)
                    mask = key_ok[:, None, :, :]
                else:
                    key_ok = (jnp.arange(lk)[None, :]
                              <= cache_index + q_pos[:, None])  # (l, lk)
                    mask = key_ok[None, None, :, :]
            if int8_cache:
                from unidisc_tpu.ops.quant import int8_kv_attention
                out = int8_kv_attention(q, ckq, cks, cvq, cvs, mask=mask)
            else:
                out = multihead_attention(q, ck, cv, mask=mask,
                                          causal=False, backend="xla")
        elif frozen_kv is not None:
            # READ-ONLY frozen-prefix attention (conditioning-frozen
            # sampling, sampling/t2i_fast.py cached_cond): keys/values are
            # [frozen conditioning K/V || fresh rows]. Unlike the kv_cache
            # path there is no dynamic_update_slice write-back — the
            # frozen prefix is a loop-invariant HBM read and the fresh
            # K/V stay a fused temp, so per-step cost is the txt-prefix
            # read instead of a full-cache copy (measured: the write-back
            # variant was throughput-neutral at 115M, BASELINE.md).
            assert c.full_attention, "frozen_kv needs full attention"
            fk, fv = frozen_kv
            k = jnp.concatenate([fk.astype(k.dtype), k], axis=1)
            v = jnp.concatenate([fv.astype(v.dtype), v], axis=1)
            out = multihead_attention(q, k, v, mask=None,
                                      causal=False, backend="xla")
        elif _ring_ctx() is not None and attn_mask is None:
            # sequence-parallel training (parallel/seq_parallel.py): L is
            # sharded over the 'seq' mesh axis; run attention as an exact
            # ppermute ring instead of letting GSPMD all-gather K/V.
            # Packed interleaved batches ride along: the per-token
            # segment ids rotate around the ring with K/V.
            from unidisc_tpu.parallel.ring_attention import ring_attention
            mesh, axis = _ring_ctx()
            import functools as _ft
            body = _ft.partial(ring_attention, axis_name=axis,
                               causal=not c.full_attention)
            if _inside_manual_mesh(axis):
                # already per-device code (e.g. inside the GPipe stage's
                # shard_map on a seq x pp mesh, parallel/pipeline.py):
                # all mesh axes are manual here, so run the ring body
                # directly — a nested shard_map would fail and the pp
                # boundary no longer all-gathers L
                out = body(q, k, v) if segment_ids is None \
                    else body(q, k, v, segment_ids[0])
            else:
                from jax.sharding import PartitionSpec as SP
                tensor_ax = ("tensor" if c.n_heads % max(
                    mesh.shape.get("tensor", 1), 1) == 0
                    and mesh.shape.get("tensor", 1) > 1 else None)
                spec = SP(("dcn", "fsdp"), axis, tensor_ax, None)
                if segment_ids is None:
                    out = jax.shard_map(
                        lambda q, k, v: body(q, k, v), mesh=mesh,
                        in_specs=(spec, spec, spec),
                        out_specs=spec, check_vma=False)(q, k, v)
                else:
                    seg_spec = SP(("dcn", "fsdp"), axis)
                    out = jax.shard_map(
                        body, mesh=mesh,
                        in_specs=(spec, spec, spec, seg_spec),
                        out_specs=spec, check_vma=False)(
                            q, k, v, segment_ids[0])
        else:
            backend = c.attn_backend
            if backend == "auto":
                # measured policy lives next to the kernel (pallas_auto_ok):
                # head-batched single-tile kernel covers the production
                # shapes (L=384, D64/D128); tiled online-softmax kernel
                # covers long sequences
                from unidisc_tpu.ops.pallas_attention import pallas_auto_ok
                backend = ("pallas" if pallas_auto_ok(d, l)
                           and attn_mask is None else "xla")
            if backend == "pallas" and attn_mask is None:
                # arbitrary dense masks aren't expressible in the kernel;
                # packed batches go through segment_ids instead
                from unidisc_tpu.ops.pallas_attention import flash_attention
                out = flash_attention(q, k, v, segment_ids=segment_ids,
                                      causal=not c.full_attention)
            else:
                out = multihead_attention(q, k, v, mask=attn_mask,
                                          causal=not c.full_attention,
                                          backend=backend)

        out = out.reshape(b, l, dim)
        out_dense = make_dense(c, dim, use_bias=False,
                               dtype=self.compute_dtype,
                               kernel_init=torch_linear_init(),
                               name="attn_out")
        out = out_dense(out, out_prologue) if out_prologue is not None \
            else out_dense(out)
        return out, new_cache


class CrossAttention(nn.Module):
    """Cross-attention to the conditioning stream (reference img_cond:
    models/dit.py:516-735 cross_attn branches + 834-835).

    Q comes from the main stream (the reference stores a full 3*dim
    ``attn_qkv`` projection on the cross module and consumes only the Q
    third — models/dit.py:651-735; we keep the full parameter for
    checkpoint parity and slice, letting XLA narrow the dot). K/V come
    from ``attn_qkv_cond`` over the cond trunk output; K gets plain 1D
    rotary at cond positions, Q the main-stream rotary.
    """

    cfg: ModelConfig
    compute_dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, x_cond, rope_cos, rope_sin, cond_rope):
        c = self.cfg
        h, d = c.n_heads, c.head_dim
        dim = c.hidden_size
        qkv = nn.Dense(3 * dim, use_bias=False, dtype=self.compute_dtype,
                       kernel_init=torch_linear_init(),
                       name="attn_qkv")(x)
        qkv_cond = nn.Dense(3 * dim, use_bias=False,
                            dtype=self.compute_dtype,
                            kernel_init=torch_linear_init(),
                            name="attn_qkv_cond")(x_cond)
        b, l = x.shape[0], x.shape[1]
        lc = x_cond.shape[1]
        q = qkv[..., :dim].reshape(b, l, h, d)
        k = qkv_cond[..., dim:2 * dim].reshape(b, lc, h, d)
        v = qkv_cond[..., 2 * dim:].reshape(b, lc, h, d)
        cond_cos, cond_sin = cond_rope
        q = apply_rope(q, rope_cos, rope_sin)
        k = apply_rope(k, cond_cos, cond_sin)
        out = multihead_attention(q, k, v, causal=False, backend="xla")
        out = out.reshape(b, l, dim)
        return nn.Dense(dim, use_bias=False, dtype=self.compute_dtype,
                        kernel_init=torch_linear_init(),
                        name="attn_out")(out)


class DDiTBlock(nn.Module):
    """Transformer block with optional adaLN-zero time conditioning and
    sandwich normalization (reference: models/dit.py:890-1033)."""

    cfg: ModelConfig
    compute_dtype: Dtype = jnp.bfloat16
    deterministic: bool = True

    @nn.compact
    def __call__(self, x, c, rope_cos, rope_sin, modality, attn_mask,
                 kv_cache, cache_index, segment_ids, x_cond=None,
                 cond_rope=None, frozen_kv=None):
        cfg = self.cfg
        dim = cfg.hidden_size

        def dropout_fn(y):
            return nn.Dropout(cfg.dropout,
                              deterministic=self.deterministic)(y)

        if cfg.time_conditioning:
            cond = nn.Dense(6 * dim, kernel_init=nn.initializers.zeros,
                            bias_init=nn.initializers.zeros,
                            dtype=self.compute_dtype,
                            name="adaLN_modulation")(c)
            cond = cond[:, None, :] if cond.ndim == 2 else cond
            (shift_msa, scale_msa, gate_msa,
             shift_mlp, scale_mlp, gate_mlp) = jnp.split(cond, 6, axis=-1)
        else:
            shift_msa = scale_msa = gate_msa = None
            shift_mlp = scale_mlp = gate_mlp = None

        # fused int8 inference: absorb norm+modulate (and gelu) into the
        # matmuls via ops/fused_qmm.py — one VMEM pass instead of separate
        # HBM round-trips per elementwise stage. The adaLN conditioning
        # must be per-batch-row ((B, 1, dim)) for the kernel's tile->batch
        # mapping to hold.
        use_fused = (cfg.quant == "int8" and cfg.quant_fused
                     and kv_cache is None
                     and (shift_msa is None or shift_msa.shape[1] == 1))
        rows_per_batch = x.shape[1]

        def adaln_prologue(norm_w, shift, scale):
            pro = dict(mode="adaln_norm", norm_type=cfg.norm_type,
                       norm_w=norm_w, rows_per_batch=rows_per_batch)
            if shift is not None:
                pro.update(shift=shift[:, 0, :], scale=scale[:, 0, :],
                           modality=(None if modality is None
                                     else modality.reshape(-1)))
            return pro

        x_skip = x
        norm1 = Norm(dim, cfg.norm_type, self.compute_dtype, name="norm1")
        attention = Attention(cfg, self.compute_dtype, name="attention")
        if use_fused:
            # fuse only the adaLN-prologue matmuls (qkv, mlp_0): those are
            # where XLA pays separate HBM passes (norm reduction +
            # modulate + quantize reduction). attn_out/mlp_2 keep the XLA
            # qdot — a bare quantize+dot is already fused well by XLA and
            # the Mosaic dot schedule is slower (measured on v5e: "none"
            # mode kernel 136 TOPS vs XLA 205 at the 115M qkv shape)
            attn_out, new_cache = attention(
                x, rope_cos, rope_sin, attn_mask, kv_cache, cache_index,
                segment_ids,
                qkv_prologue=adaln_prologue(norm1(None, return_weight=True),
                                            shift_msa, scale_msa),
                frozen_kv=frozen_kv)
        else:
            hidden = norm1(x)
            if cfg.time_conditioning:
                hidden = modulate(hidden, shift_msa, scale_msa, modality)
            attn_out, new_cache = attention(
                hidden, rope_cos, rope_sin, attn_mask, kv_cache,
                cache_index, segment_ids, frozen_kv=frozen_kv)

        if cfg.sandwich_normalization:
            # pre-residual norm replaces the gate on the attention branch
            # (reference: models/dit.py:995-997)
            x = x_skip + Norm(dim, cfg.norm_type, self.compute_dtype,
                              name="pre_residual_norm")(attn_out)
        else:
            x = gate_residual(x_skip, attn_out, gate_msa, modality,
                              dropout_fn=dropout_fn)

        if cfg.img_cond and x_cond is not None:
            # Faithful to the reference residual wiring
            # (models/dit.py:996-1010): the cross output is added to
            # x_skip — the BLOCK INPUT — so the self-attention branch
            # contributes only through the cross-attention queries. The
            # cross epilogue never sees modality (the reference calls it
            # without the modality arg).
            cross_out = CrossAttention(cfg, self.compute_dtype,
                                       name="cross_attention")(
                x, x_cond, rope_cos, rope_sin, cond_rope)
            x = gate_residual(x_skip, cross_out, gate_msa, None,
                              dropout_fn=dropout_fn)

        norm2 = Norm(dim, cfg.norm_type, self.compute_dtype, name="norm2")
        moe_aux = None
        if cfg.moe_experts > 0:
            # MoE MLP (models/moe.py, beyond the reference): capacity-
            # routed experts sharded over the 'ep' mesh axis. The fused
            # int8 prologue path doesn't apply — routing needs the
            # normalized hidden explicitly.
            from unidisc_tpu.models.moe import MoEMLP
            hidden = norm2(x)
            if cfg.time_conditioning:
                hidden = modulate(hidden, shift_mlp, scale_mlp, modality)
            hidden, moe_aux = MoEMLP(cfg, self.compute_dtype,
                                     name="moe")(hidden)
        else:
            mlp_0 = make_dense(cfg, cfg.mlp_ratio * dim, use_bias=True,
                               dtype=self.compute_dtype,
                               kernel_init=torch_linear_init(),
                               bias_init=torch_linear_init(), name="mlp_0")
            mlp_2 = make_dense(cfg, dim, use_bias=True,
                               dtype=self.compute_dtype,
                               kernel_init=torch_linear_init(),
                               bias_init=torch_linear_init(), name="mlp_2")
            if use_fused:
                hidden = mlp_0(x, adaln_prologue(
                    norm2(None, return_weight=True), shift_mlp, scale_mlp))
                hidden = nn.gelu(hidden, approximate=True)
                hidden = mlp_2(hidden)
            else:
                hidden = norm2(x)
                if cfg.time_conditioning:
                    hidden = modulate(hidden, shift_mlp, scale_mlp,
                                      modality)
                hidden = mlp_0(hidden)
                hidden = nn.gelu(hidden, approximate=True)
                hidden = mlp_2(hidden)
        if cfg.sandwich_normalization:
            hidden = Norm(dim, cfg.norm_type, self.compute_dtype,
                          name="post_ff_norm")(hidden)
        x = gate_residual(x, hidden, gate_mlp, modality, dropout_fn=dropout_fn)
        if cfg.moe_experts > 0:
            # per-layer scan output carries (cache, balance-aux); DIT
            # unpacks and sums the aux over layers
            return x, (new_cache, moe_aux)
        return x, new_cache


class DDitFinalLayer(nn.Module):
    """Zero-initialized output head (reference: models/dit.py:1065-1092)."""

    cfg: ModelConfig
    compute_dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, c, modality=None):
        cfg = self.cfg
        x = Norm(cfg.hidden_size, cfg.norm_type, self.compute_dtype,
                 name="norm_final")(x)
        if cfg.time_conditioning:
            cond = nn.Dense(2 * cfg.hidden_size,
                            kernel_init=nn.initializers.zeros,
                            bias_init=nn.initializers.zeros,
                            dtype=self.compute_dtype,
                            name="adaLN_modulation")(c)
            cond = cond[:, None, :] if cond.ndim == 2 else cond
            shift, scale = jnp.split(cond, 2, axis=-1)
            x = modulate(x, shift, scale, modality)
        kernel_init = (nn.initializers.zeros if cfg.zero_linear_init
                       else torch_linear_init())
        # logits dtype: fp32 default (training); bf16 opt-in halves the
        # (B, L, vocab) HBM traffic on the inference hot path. The matmul
        # always accumulates in fp32 (preferred_element_type via dtype).
        out_dtype = jnp.bfloat16 if cfg.logits_dtype == "bfloat16" \
            else jnp.float32
        x = make_dense(cfg, cfg.vocab_size, use_bias=True, dtype=out_dtype,
                       kernel_init=kernel_init,
                       bias_init=nn.initializers.zeros, name="linear")(
                           x.astype(out_dtype))
        return x


class DIT(nn.Module):
    """The UniDisc denoiser (reference: models/dit.py:1095-1500).

    __call__ args:
      indices: (B, L) int tokens over the unified vocab.
      sigma: (B,) total noise (used when time_conditioning).
      modality: optional (B, L) 0=text/1=image.
      attn_mask: optional boolean mask broadcastable to (B, H, L, L);
        use ops.attention.make_sample_ids_mask for interleaved batches.
      label: optional (B,) class labels (cond_label mode).
      kv_cache: optional (k, v) tuple, each (n_blocks, B, max_len, H, D),
        for AR decode; cache_index is the write/read position.
      frozen_kv: optional READ-ONLY (fk, fv) tuple, each
        (n_blocks, B, Lf, H, D) bf16 — attention keys/values become
        [frozen prefix || fresh rows] with NO cache write-back
        (conditioning-frozen sampling, sampling/t2i_fast.py cached_cond;
        the fresh rows' rope offset comes from cache_index). Mutually
        exclusive with kv_cache; full-attention models only.
      deterministic: disables dropout.

    Returns fp32 logits (B, L, vocab); with kv_cache, returns
    (logits, new_kv_cache).
    """

    cfg: ModelConfig
    compute_dtype: Dtype = jnp.bfloat16
    remat: bool = False

    @nn.compact
    def __call__(self, indices, sigma=None, *, modality=None, attn_mask=None,
                 label=None, kv_cache=None, cache_index=None,
                 sample_ids=None, rope_index=None, extra_embed=None,
                 img_block_index=None, x_cond=None, return_hidden=False,
                 frozen_kv=None, return_moe_aux=False, deterministic=True):
        cfg = self.cfg
        if cfg.split_embed:
            # reference use_pretrained_img_emb (models/dit.py:1343-1359):
            # text through a (text_vocab+1)-row table whose extra row is
            # the mask token; image ids through the (frozen) VQ codebook
            # table projected to hidden_size
            tvs = cfg.text_vocab_size
            vocab_embed = self.param("vocab_embed", embedding_init(),
                                     (tvs + 1, cfg.hidden_size))
            img_embed = self.param(
                "img_vocab_embed", embedding_init(),
                (cfg.image_vocab_size, cfg.img_embed_dim))
            mask_tok = indices == cfg.mask_index
            img_tok = (indices >= tvs) & ~mask_tok
            txt_ids = jnp.where(indices < tvs, indices, 0)
            txt_ids = jnp.where(mask_tok, tvs, txt_ids)
            txt_x = jnp.take(vocab_embed, txt_ids, axis=0)
            img_ids = jnp.where(img_tok, indices - tvs, 0)
            img_x = nn.Dense(cfg.hidden_size, name="img_vocab_proj")(
                jnp.take(img_embed, img_ids, axis=0))
            x = jnp.where(img_tok[..., None], img_x,
                          txt_x).astype(self.compute_dtype)
        else:
            vocab_embed = self.param("vocab_embed", embedding_init(),
                                     (cfg.vocab_size, cfg.hidden_size))
            x = jnp.take(vocab_embed, indices,
                         axis=0).astype(self.compute_dtype)
        if cfg.img_count_embed:
            # per-image-block-count embedding on image tokens (reference
            # img_count_embedding + add_img_data_to_blocks,
            # models/dit.py:1216-1218, 124-179); img_block_index is the
            # 0-based count of prior image blocks in the same sample,
            # emitted by the packing collate (data/interleaved.py)
            count_table = self.param(
                "img_count_embedding", nn.initializers.zeros,
                (cfg.max_images_per_sample, cfg.hidden_size))
            if img_block_index is not None:
                assert modality is not None
                idx = jnp.clip(img_block_index, 0,
                               cfg.max_images_per_sample - 1)
                add = jnp.take(count_table, idx, axis=0)
                x = x + jnp.where((modality == 1)[..., None], add,
                                  0.0).astype(self.compute_dtype)
        if extra_embed is not None:
            # continuous-latent pathway (transfusion mode): projected
            # latents are added at image positions (models/continuous.py)
            x = x + extra_embed.astype(self.compute_dtype)

        c = None
        if cfg.time_conditioning and not cfg.cond_label:
            assert sigma is not None
            c = nn.silu(TimestepEmbedder(cfg.cond_dim,
                                         compute_dtype=self.compute_dtype,
                                         name="sigma_map")(sigma))
        if cfg.cond_label:
            assert label is not None
            c = LabelEmbedder(1000, cfg.cond_dim, name="y_embedder")(
                label, rng=self.make_rng("dropout") if not deterministic else None,
                train=not deterministic).astype(self.compute_dtype)

        if cfg.modality_embed:
            assert modality is not None
            table = self.param("modality_embed", embedding_init(),
                               (2, cfg.hidden_size))
            x = x + jnp.take(table, modality, axis=0).astype(self.compute_dtype)

        # rotary tables (constants folded into the jitted graph)
        if cfg.img_resolutions is not None:
            from unidisc_tpu.models.rotary import build_multires_rope
            cos_np, sin_np, _ = build_multires_rope(
                cfg.length, cfg.img_resolutions, cfg.head_dim,
                base=cfg.rope_base)
        else:
            cos_np, sin_np = build_multimodal_rope(
                cfg.txt_length, cfg.img_length, cfg.head_dim, cfg.rope_2d,
                base=cfg.rope_base)
        rope_cos = jnp.asarray(cos_np)
        rope_sin = jnp.asarray(sin_np)
        if rope_index is not None and cfg.img_resolutions is not None:
            # absolute indices into the combined multi-resolution table
            eff = jnp.clip(rope_index, 0, rope_cos.shape[0] - 1)
            rope_cos = jnp.take(rope_cos, eff, axis=0)
            rope_sin = jnp.take(rope_sin, eff, axis=0)
        elif rope_index is not None:
            # interleaved batches: per-token index into the combined
            # [1D-text | 2D-image] table; image tokens restart per block
            # (replaces reference add_img/txt_data_to_blocks stitching,
            # models/dit.py:122-191)
            assert modality is not None
            eff = jnp.clip(rope_index, 0, cfg.txt_length - 1)
            eff = jnp.where(modality == 1,
                            cfg.txt_length + jnp.clip(rope_index, 0,
                                                      cfg.img_length - 1),
                            eff)
            rope_cos = jnp.take(rope_cos, eff, axis=0)   # (B, L, d2)
            rope_sin = jnp.take(rope_sin, eff, axis=0)
        elif kv_cache is not None and jnp.ndim(cache_index) == 1:
            # per-row decode positions (continuous batching): gather each
            # row's rotary rows at cache_index[b] + [0, l)
            pos = (cache_index[:, None]
                   + jnp.arange(indices.shape[1])[None, :])   # (B, l)
            pos = jnp.clip(pos, 0, rope_cos.shape[0] - 1)
            rope_cos = jnp.take(rope_cos, pos, axis=0)        # (B, l, d2)
            rope_sin = jnp.take(rope_sin, pos, axis=0)
        elif kv_cache is not None or frozen_kv is not None:
            rope_cos = jax.lax.dynamic_slice_in_dim(
                rope_cos, cache_index, indices.shape[1], axis=0)
            rope_sin = jax.lax.dynamic_slice_in_dim(
                rope_sin, cache_index, indices.shape[1], axis=0)
        else:
            rope_cos = rope_cos[:indices.shape[1]]
            rope_sin = rope_sin[:indices.shape[1]]

        x_cond_repr = None
        cond_rope = None
        if cfg.img_cond and x_cond is not None:
            # Conditioning-image encoder trunk (reference img_cond,
            # models/dit.py:1147-1183, 1385-1400): embed the cond token
            # stream, run it through n_cond_blocks plain blocks with 1D
            # rotary, and hand the result to every main block's
            # cross-attention. The reference constructs the cond blocks
            # with the model's time_conditioning but calls them with
            # c=None (models/dit.py:1393 passes None) — the only runnable
            # reading is unconditioned cond blocks, which is what we
            # build. Incompatible with KV-cache decode (reference asserts,
            # models/dit.py:1386).
            assert kv_cache is None, "img_cond excludes KV-cache decode"
            import dataclasses as _dc
            if cfg.cond_img_embed_dim is not None:
                # cond VQ codebook reuse + projection (reference
                # models/dit.py:1148-1151)
                cond_table = self.param(
                    "cond_img_vocab_embed", embedding_init(),
                    (cfg.cond_image_vocab_size, cfg.cond_img_embed_dim))
                ce = jnp.take(cond_table, x_cond, axis=0)
                ce = nn.Dense(cfg.hidden_size,
                              name="cond_img_vocab_proj")(ce)
            else:
                cond_table = self.param(
                    "cond_img_vocab_embed", embedding_init(),
                    (cfg.cond_image_vocab_size, cfg.hidden_size))
                ce = jnp.take(cond_table, x_cond, axis=0)
            ce = ce.astype(self.compute_dtype)
            from unidisc_tpu.models.rotary import rope_1d
            ccos, csin = rope_1d(x_cond.shape[1], cfg.head_dim,
                                 base=cfg.rope_base)
            cond_rope = (jnp.asarray(ccos), jnp.asarray(csin))
            cond_cfg = _dc.replace(cfg, time_conditioning=False,
                                   img_cond=False, moe_experts=0)
            cond_blocks = nn.scan(
                DDiTBlock,
                variable_axes={"params": 0},
                split_rngs={"params": True, "dropout": True},
                in_axes=(nn.broadcast,) * 10,
                length=cfg.n_cond_blocks,
                metadata_params={nn.PARTITION_NAME: "layers"},
            )(cond_cfg, self.compute_dtype, deterministic,
              name="img_cond_blocks")
            x_cond_repr, _ = cond_blocks(ce, None, cond_rope[0],
                                         cond_rope[1], None, None, None,
                                         None, None, None, None)

        if sample_ids is not None and attn_mask is None:
            # packed interleaved batches: the pallas kernel and the
            # sequence-parallel ring take structured segment ids directly
            # — only materialize the dense (B,1,L,L) mask when the XLA
            # einsum backend will actually run
            from unidisc_tpu.ops.pallas_attention import pallas_auto_ok
            goes_pallas = cfg.attn_backend == "pallas" or (
                cfg.attn_backend == "auto"
                and pallas_auto_ok(cfg.head_dim, indices.shape[1])
                and kv_cache is None)
            if not goes_pallas and _ring_ctx() is None:
                from unidisc_tpu.ops.attention import make_sample_ids_mask
                attn_mask = make_sample_ids_mask(sample_ids)
        segment_ids = (sample_ids, sample_ids) if sample_ids is not None \
            else None

        from unidisc_tpu.parallel.pipeline import current_pp
        pp_ctx = current_pp()
        stacked = None
        if (pp_ctx is not None and kv_cache is None and frozen_kv is None
                and not self.is_initializing()
                and (deterministic or cfg.dropout == 0.0)):
            stacked = self.get_variable("params", "blocks")

        if stacked is not None:
            # pipeline-parallel trunk (parallel/pipeline.py): the block
            # stack runs as a GPipe ppermute ring over the 'pp' mesh
            # axis — each stage's layer-group weights are resident in
            # its own HBM (param_spec shards the stacked layer axis)
            mesh, axis, micro = pp_ctx
            from unidisc_tpu.parallel.pipeline import pipeline_sharded
            mb = {}
            if c is not None:
                mb["c"] = c
            if modality is not None:
                mb["modality"] = modality
            if attn_mask is not None:
                mb["attn_mask"] = attn_mask
            if segment_ids is not None:
                mb["seg"] = segment_ids[0]
            bcast = ()
            if rope_cos.ndim == 3:          # per-row rope (interleaved)
                mb["rope_cos"], mb["rope_sin"] = rope_cos, rope_sin
            else:
                bcast = (rope_cos, rope_sin)
            block = DDiTBlock(cfg, self.compute_dtype, deterministic)

            def stage_fn(local_params, a, mbt, *rope):
                rc = mbt.get("rope_cos", rope[0] if rope else None)
                rs = mbt.get("rope_sin", rope[1] if rope else None)
                seg = mbt.get("seg")

                def layer(carry, p):
                    y, _ = block.apply(
                        {"params": p}, carry, mbt.get("c"), rc, rs,
                        mbt.get("modality"), mbt.get("attn_mask"),
                        None, None,
                        (seg, seg) if seg is not None else None)
                    return y, None
                a, _ = jax.lax.scan(layer, a, local_params)
                return a

            # seq x pp composition: keep the L axis sharded over 'seq'
            # inside the pipeline stage (the ring runs directly in the
            # stage body — see _inside_manual_mesh in the attention)
            seq_kw = {}
            sp_ctx = _ring_ctx()
            if sp_ctx is not None and mesh.shape.get(sp_ctx[1], 1) > 1:
                seq_ax = sp_ctx[1]
                assert "attn_mask" not in mb, \
                    "dense attn_mask is incompatible with seq x pp (the " \
                    "ring handles segment isolation via sample_ids)"
                # post-microbatch dims: x (M, mb, L, H) -> 2;
                # (B, L)-shaped mb leaves -> 2; c (B, cond) -> None
                seq_kw = dict(
                    seq_axis=seq_ax, x_seq_dim=2,
                    mb_seq_dims={k: (None if k == "c" else 2)
                                 for k in mb},
                    bcast_seq_dims=tuple(0 for _ in bcast))
            x = pipeline_sharded(stage_fn, stacked, x, mesh, *bcast,
                                 mb_args=mb, pp_axis=axis,
                                 microbatches=micro,
                                 batch_axes=("dcn", "fsdp"), **seq_kw)
            new_cache = None
        else:
            block_cls = DDiTBlock
            if self.remat:
                # remat policy: what the backward may KEEP instead of
                # recomputing (model.remat_policy; "none" = classic full
                # recompute). Saving the dots skips the MXU share of the
                # recompute at the cost of per-block activation HBM.
                policy = {
                    "none": None,
                    "dots": jax.checkpoint_policies
                    .dots_with_no_batch_dims_saveable,
                    "dots_all": jax.checkpoint_policies.dots_saveable,
                }[cfg.remat_policy]
                block_cls = nn.remat(DDiTBlock, prevent_cse=False,
                                     policy=policy)
            blocks = nn.scan(
                block_cls,
                variable_axes={"params": 0},
                split_rngs={"params": True, "dropout": True},
                in_axes=(nn.broadcast, nn.broadcast, nn.broadcast,
                         nn.broadcast, nn.broadcast, 0, nn.broadcast,
                         nn.broadcast, nn.broadcast, nn.broadcast, 0),
                length=cfg.n_blocks,
                metadata_params={nn.PARTITION_NAME: "layers"},
            )(cfg, self.compute_dtype, deterministic, name="blocks")

            x, new_cache = blocks(x, c, rope_cos, rope_sin, modality,
                                  attn_mask, kv_cache, cache_index,
                                  segment_ids, x_cond_repr, cond_rope,
                                  frozen_kv)

        moe_aux = None
        if cfg.moe_experts > 0 and stacked is None:
            new_cache, aux_stack = new_cache
            moe_aux = jnp.sum(aux_stack)
        elif cfg.moe_experts > 0:
            # pipeline trunk: per-layer aux is not threaded out of the
            # GPipe stage body; the router still trains through the
            # combine gates (the balance regularizer is skipped)
            moe_aux = jnp.zeros((), jnp.float32)

        logits = DDitFinalLayer(cfg, self.compute_dtype, name="output_layer")(
            x, c, modality)
        if return_moe_aux:
            # training loss path (training/train_state.py): the router
            # load-balance auxiliary rides alongside the logits
            assert kv_cache is None and not return_hidden
            if moe_aux is None:
                moe_aux = jnp.zeros((), jnp.float32)
            return logits, moe_aux
        if return_hidden:
            if kv_cache is not None:
                # span-factored samplers with a conditioning KV cache
                # (sampling/t2i_fast.py cached_cond): hidden for the
                # factored head AND the updated cache. The full-vocab
                # `logits` are dead in those callers and DCE'd by XLA.
                return logits, x, new_cache
            return logits, x
        if kv_cache is not None:
            return logits, new_cache
        return logits


def count_params(params) -> int:
    return int(sum(np.prod(p.shape) for p in jax.tree_util.tree_leaves(params)))


def init_dit(rng: jax.Array, cfg: ModelConfig, *, compute_dtype=jnp.bfloat16,
             batch_size: int = 1, remat: bool = False):
    """Initialize a DIT and its parameters; returns (module, params)."""
    model = DIT(cfg, compute_dtype=compute_dtype, remat=remat)
    dummy_tokens = jnp.zeros((batch_size, cfg.length), jnp.int32)
    dummy_sigma = jnp.zeros((batch_size,), jnp.float32)
    dummy_modality = jnp.zeros((batch_size, cfg.length), jnp.int32)
    label = jnp.zeros((batch_size,), jnp.int32) if cfg.cond_label else None
    x_cond = (jnp.zeros((batch_size, cfg.cond_length), jnp.int32)
              if cfg.img_cond else None)
    params = model.init({"params": rng}, dummy_tokens, dummy_sigma,
                        modality=dummy_modality, label=label,
                        x_cond=x_cond)["params"]
    return model, params
