"""Configuration system for unidisc_tpu.

Plain frozen dataclasses (hashable, usable as jit static args) replace the
reference's Hydra/OmegaConf tree (reference: configs/config.yaml:1-451).
Presets mirror configs/model/*.yaml; experiment overlays become keyword
overrides via ``replace`` / ``Config.make``.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field, replace
from typing import Any, Optional, Tuple

# ---------------------------------------------------------------------------
# Vocab constants (reference: model_setup.py:90-115)
# LLaMA-2 tokenizer: 32000 ids, no mask token -> mask_index = 32000, text
# vocab becomes 32001; LlamaGen VQ-16 image codebook: 16384 ids offset by the
# text vocab size.
# ---------------------------------------------------------------------------
LLAMA2_VOCAB = 32000
DEFAULT_TEXT_VOCAB = LLAMA2_VOCAB + 1  # +1 mask token
DEFAULT_IMAGE_VOCAB = 16384


@dataclass(frozen=True)
class ModelConfig:
    """Backbone (DiT) hyperparameters. Mirrors configs/model/*.yaml."""

    name: str = "small"
    hidden_size: int = 768
    cond_dim: int = 128
    n_blocks: int = 12
    n_heads: int = 12
    mlp_ratio: int = 4
    dropout: float = 0.1
    attn_dropout: float = 0.0
    # sequence layout: [txt(txt_length) | img(img_length)] (non-interleaved)
    length: int = 1024
    txt_length: int = 128
    img_length: int = 256
    # vocab
    text_vocab_size: int = DEFAULT_TEXT_VOCAB
    image_vocab_size: int = DEFAULT_IMAGE_VOCAB
    # class-label conditioning as extra VOCAB tokens (reference:
    # model.add_labels, model_setup.py:104-106 vocab_size += add_labels;
    # trainer.add_label writes label+shift at position 0, model.py:322-334).
    # Distinct from cond_label (adaLN class embedding).
    add_labels: Optional[int] = None
    # architecture flags (reference: configs/config.yaml model section)
    norm_type: str = "layernorm"  # layernorm | rms
    qk_norm: bool = False
    sandwich_normalization: bool = False
    time_conditioning: bool = False
    cond_label: bool = False
    # cross-attention image conditioning (reference model.img_cond,
    # models/dit.py:1147-1183, 1385-1400): a second token stream (e.g. a
    # low-resolution conditioning image encoded by a cond VAE at
    # data.cond_resolution, model.py:262-263) runs through its own
    # n_cond_blocks-deep encoder trunk, then every main block
    # cross-attends to it (Q from the main stream, K/V from the cond
    # stream) after self-attention. Used for super-resolution-style
    # image-conditioned generation.
    img_cond: bool = False
    cond_image_vocab_size: Optional[int] = None
    cond_length: Optional[int] = None
    n_cond_blocks: int = 8  # reference hardcodes 8 (models/dit.py:1156)
    # width of the cond embedding table when the cond VAE codebook is
    # reused (reference use_pretrained_img_emb cond branch,
    # models/dit.py:1148-1151); None = learned table at hidden_size
    cond_img_embed_dim: Optional[int] = None
    rope_2d: bool = False
    # interleaved variable-resolution batches: 2D rope table per grid size
    # (reference per-resolution buffers, models/dit.py:1203-1232);
    # rope_index is then ABSOLUTE into the combined [1D | 2D...] table
    img_resolutions: Optional[Tuple[int, ...]] = None
    # learned per-image-block-count embedding added to image tokens in
    # interleaved batches (reference img_count_embedding,
    # models/dit.py:1216-1218; ships in the published interleaved ckpt)
    img_count_embed: bool = False
    max_images_per_sample: int = 16
    # split embedding (reference use_pretrained_img_emb,
    # models/dit.py:1343-1359): text ids embed through a
    # (text_vocab+1)-row table (+1 = the mask row), image ids through a
    # frozen VQ-codebook table of width img_embed_dim projected up to
    # hidden_size. The default-config reference checkpoints use this.
    split_embed: bool = False
    img_embed_dim: int = 8  # LlamaGen VQ-16 codebook dim
    modality_embed: bool = False
    zero_linear_init: bool = True
    full_attention: bool = True  # False => causal (AR mode)
    force_argmax_valid_indices: bool = False
    rope_base: float = 10_000.0
    # attention backend: "auto" (pallas flash kernel when head_dim%128==0
    # and seq>=512, else XLA einsum), "xla", or "pallas" (forced)
    attn_backend: str = "auto"
    # logits dtype: fp32 for training stability; bf16 halves the logits
    # HBM traffic for inference (the (B, L, 48k) tensor dominates sampler
    # memory time)
    logits_dtype: str = "float32"
    # LoRA fine-tuning (reference: model.use_lora + peft LoraConfig(r=16,
    # lora_alpha=32, target_modules=["qkv_proj"]), model_setup.py:175-188;
    # training/lora.py). rank 0 = full fine-tuning (off).
    lora_rank: int = 0
    lora_alpha: float = 32.0
    lora_targets: Tuple[str, ...] = ("attn_qkv", "qkv_proj")
    # param-path patterns trained in full via zero-init deltas (reference
    # keeps token_embeddings_extra / lm_extra trainable under LoRA,
    # model_setup.py:186-188)
    lora_train_full: Tuple[str, ...] = ()
    # inference quantization: None | "int8" (W8A8 — per-channel int8
    # weights + dynamic per-token int8 activations on the trunk matmuls
    # and vocab head; 1.7-1.8x matmul speedup measured on v5e, see
    # ops/quant.py). Convert params with quant.quantize_dit_params.
    quant: Optional[str] = None
    # int8 matmul backend: "xla" | "pallas" (ops/int8_matmul.py Mosaic
    # full-K-slab kernel with fused epilogue; pick per
    # scripts/bench_int8_dot.py on the target chip)
    quant_backend: str = "xla"
    # Pallas norm+adaLN+quantize prologue kernel feeding the int8 matmuls
    # (ops/fused_qmm.py). MEASURED NEUTRAL-TO-NEGATIVE on v5e at the 115M
    # flagship (6413 vs ~6540 tok/s): XLA already fuses the unfused
    # elementwise chain tightly, and a hand-tiled Mosaic int8 dot is
    # slower than XLA's (136 vs 205 TOPS at the qkv shape) — so this
    # stays OFF by default; kept as a tested option for shapes where the
    # adaLN chain dominates
    quant_fused: bool = False
    # AR decode KV cache dtype: "bf16" | "int8" (per-position-per-head
    # symmetric scales; scores/values use int8 MXU dots with rank-1
    # rescales — ops/quant.py int8_kv helpers). Halves the cache reads
    # that dominate large-batch decode.
    kv_cache_dtype: str = "bf16"
    # gradient-checkpointing (remat) policy for the scanned block stack
    # when trainer.use_gradient_checkpointing is on:
    #   "none" — recompute everything in the backward (max memory saving)
    #   "dots" — jax.checkpoint_policies.dots_with_no_batch_dims_saveable:
    #            keep matmul outputs, recompute elementwise chains — trades
    #            a little HBM for skipping the MXU recompute
    #   "dots_all" — jax.checkpoint_policies.dots_saveable (incl. batched
    #            dots, i.e. attention score/value products)
    remat_policy: str = "none"
    # muP (maximal-update parameterization) hyperparameter transfer: scale
    # per-matrix learning rates by mup_base_width/hidden_size (the MuAdam
    # rule; reference: model.mup flag + mup.MuAdam, model_setup.py:163/416)
    mup: bool = False
    mup_base_width: int = 256
    # Mixture-of-Experts MLP (BEYOND the reference, which has no MoE):
    # 0 = dense MLP; >0 replaces every block's MLP with moe_experts
    # experts routed top-k with a fixed per-expert capacity
    # (models/moe.py). Expert weights shard over the 'ep' mesh axis
    # (expert parallelism — token routing becomes XLA all_to_alls over
    # ICI under GSPMD).
    moe_experts: int = 0
    moe_top_k: int = 2
    # per-expert slot budget C = ceil(capacity_factor * top_k * S / E)
    # for S tokens; overflow tokens fall through to the residual stream
    moe_capacity_factor: float = 1.25

    @property
    def vocab_size(self) -> int:
        return (self.text_vocab_size + self.image_vocab_size
                + (self.add_labels or 0))

    @property
    def label_shift(self) -> int:
        """First label token id (reference: model.py:327 shift_index =
        vocab_size - add_labels)."""
        assert self.add_labels
        return self.vocab_size - self.add_labels

    @property
    def mask_index(self) -> int:
        return self.text_vocab_size - 1

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.n_heads


@dataclass(frozen=True)
class NoiseConfig:
    """Noise schedule (reference: models/noise_schedule.py:13-157)."""

    type: str = "loglinear"  # loglinear | cosine | cosinesqr | linear | geometric
    eps: float = 1e-3
    sigma_min: float = 1e-3  # linear/geometric only
    sigma_max: float = 10.0


@dataclass(frozen=True)
class TrainerConfig:
    """Training hyperparameters (reference: configs/config.yaml trainer/optim)."""

    # optimization (reference: configs/config.yaml optim)
    optimizer: str = "adamw"  # adamw | adafactor | lion | ademamix | muon
    grad_accum_steps: int = 1  # lax.scan microbatching when > 1
    lr: float = 3e-4
    weight_decay: float = 0.0
    beta1: float = 0.9
    beta2: float = 0.999
    opt_eps: float = 1e-8
    warmup_steps: int = 2500
    # constant_warmup | cosine_decay | constant_warmup_cosine_decay |
    # cosine_hard_restarts (reference: configs/lr_scheduler/*.yaml)
    lr_schedule: str = "constant_warmup"
    lr_min: float = 1e-6      # floor for the decaying schedules
    warmup_lr_init: float = 0.0
    num_cycles: int = 1       # cosine_hard_restarts cycle count
    max_steps: int = 1_000_000
    gradient_clip_val: float = 1.0
    ema_decay: float = 0.9999
    # loss
    antithetic_sampling: bool = True
    sampling_eps: float = 1e-3
    importance_sampling: bool = False
    softmin_snr: Optional[float] = None  # gamma; production uses 5
    # constant per-token CE weight in place of the NELBO
    # dsigma/expm1(sigma) weighting; also bypasses softmin-SNR
    # (reference trainer.no_ce_weighting, model.py:972/989)
    no_ce_weighting: bool = False
    # MoE router load-balance auxiliary loss weight (Switch-Transformer
    # style E * sum(f_e * P_e); only read when model.moe_experts > 0)
    moe_aux_weight: float = 0.01
    # lr *= global_batch_size / 512 (reference main.py:320-322)
    scale_lr_by_batch_size: bool = False
    # keep parameters (and therefore optimizer/EMA state) in bf16 —
    # halves parameter HBM at a small quality cost (reference
    # trainer.low_precision_params, model_setup.py:119/294)
    low_precision_params: bool = False
    # host-offloaded fp32-master training (training/offload.py): bf16
    # working weights in HBM, fp32 master + optimizer moments + EMA in
    # pinned_host memory, streamed through HBM one chunk at a time —
    # fits 1.4B fp32-master AdamW on ONE 16G v5e chip. Single-device by
    # design (multi-chip memory scaling is the FSDP mesh).
    host_offload_optimizer: bool = False
    host_offload_chunks: int = 8
    text_loss_weight: Optional[float] = None  # production: 1.0
    img_loss_weight: Optional[float] = None  # production: 0.6
    mask_entire_modality: Optional[float] = None  # production: 0.15
    # parameterization: subs (masked diffusion) | ar (autoregressive)
    parameterization: str = "subs"
    ar_shift: bool = False
    # joint AR+NAR training (reference: trainer.joint_ar_nar_prob warmup
    # model.py:541-551, per-row AR/NAR loss mixing model.py:1110-1134, and
    # trainer.ar_llm_loss — CE on masked positions from the raw logits,
    # model.py:1076-1108). NOTE: the reference's joint combine adds an
    # UNDEFINED `weighted_z_loss` (model.py:1134) — enabling the path there
    # crashes with NameError; we implement it with z-loss = 0 (the only
    # runnable reading) and parity-test against the reference code with
    # that name injected as 0.
    joint_ar_nar_prob: Optional[float] = None
    joint_ar_nar_prob_warmup_steps: Optional[int] = None
    ar_llm_loss: bool = False
    # AR inpainting training (reference: trainer.ar_inpainting,
    # model.py:880-896): each sequence is doubled to [corrupted || clean],
    # the corrupted copy masked at an antithetic per-row rate in (0, 1),
    # and the AR loss applied to the clean half only — the AR model learns
    # to reproduce a sequence given a partially-masked copy as prefix.
    ar_inpainting: bool = False
    # label-as-token class conditioning (reference: trainer.add_label,
    # model.py:322-334/553-554): batch["label"]+model.label_shift is
    # written at position 0, excluded from the loss (attention_mask[0] =
    # False) and never corrupted. first_token_dropout masks the label
    # token with this probability during training — the label-CFG
    # unconditional branch (reference: model.py:556-563, asserts
    # model_setup.py:450-455).
    add_label: bool = False
    first_token_dropout: Optional[float] = None
    # change-of-variables training objective (reference:
    # trainer.change_of_variables, model.py:850-857 + 969-970): the
    # backbone is conditioned on t itself, move_chance interpolates in
    # log space between sigma_min and sigma_max, and the per-token loss
    # uses the CONSTANT weight log1p(-exp(-sigma_min)) instead of
    # dsigma/expm1(sigma). importance_sampling shares the constant-weight
    # loss (model.py:969) with the t-transform instead. Mutually
    # exclusive (reference assert, model_setup.py:436).
    change_of_variables: bool = False
    # corruption mode: "absorbing" (default, mask token) | "uniform"
    # (random in-vocab tokens; reference trainer.discrete_diffusion_mode,
    # model.py:567-580)
    discrete_diffusion_mode: str = "absorbing"
    # AR-training batch transforms (reference: model.py:352-370 per-row
    # [txt|img] -> [img|txt] flip; model.py:897-907 first-modality
    # masking dropout)
    rand_flip_ar_prob: Optional[float] = None
    rand_ar_modality_dropout: Optional[float] = None
    # debug/eval overrides (reference: trainer.force_timestep and
    # eval.ar_inpainting_force_val, model.py:611-614 / 892-893): pin the
    # pre-eps uniform draw (force_timestep, t = (1-eps)*v + eps) or the
    # ar_inpainting mask rate to a fixed value
    force_timestep: Optional[float] = None
    ar_inpainting_force_val: Optional[float] = None
    # batch / precision
    global_batch_size: int = 512
    dtype: str = "bfloat16"
    use_gradient_checkpointing: bool = False
    multimodal_batches: bool = False
    interleaved: bool = False


@dataclass(frozen=True)
class SamplingConfig:
    """Sampler settings (reference: configs/config.yaml sampling/eval)."""

    predictor: str = "ddpm_cache"  # ddpm | ddpm_cache | maskgit | maskgit_nucleus | first_hitting
    steps: int = 128
    noise_removal: bool = True
    cfg: Optional[float] = None  # classifier-free guidance weight
    cfg_min_timestep: Optional[float] = None
    cfg_max_timestep: Optional[float] = None
    # constant (non-annealed) CFG weight (reference eval.force_cfg_value).
    # NOTE: the reference AR sampler's annealed call
    # get_cfg_weight(1 - i/N) CRASHES upstream ((_cfg*(1-t))[:, None] on a
    # float t, model_eval.py:1746) — force_cfg_value=True is the only
    # runnable reference AR+CFG configuration; our annealed path is the
    # intended-but-broken behavior, fixed.
    force_cfg_value: bool = False
    maskgit_r_temp: float = 10.0
    maskgit_mode: str = "arccos"  # root | linear | square | cosine | arccos
    # dilated unmasking ("Plan for Speed: Dilated Scheduling for Masked
    # Diffusion LMs", PAPERS.md): restrict each maskgit step's reveals to
    # one of d^2 spatially-dilated 2D groups (tokens in a group are >= d
    # apart in both grid axes), weakening intra-step independence errors
    # so fewer steps reach equal quality. 0 = off.
    maskgit_dilation: int = 0
    # conditioning-frozen t2i sampling (sampling/t2i_fast.py cached_cond +
    # models/dit.py frozen_kv): text K/V computed once at step 0 and held
    # READ-ONLY; every denoise step runs the trunk over the image rows
    # alone (img_length/L of the FLOPs). Approximation: frozen text
    # representations go stale w.r.t. the evolving image between
    # refreshes — quality-A/B'd on the trained synthetic task
    # (scripts/nfe_quality_ab.py --mode cached), measured 1.2-1.3x at
    # 1.4B (BASELINE.md). cached_cond_refresh > 0 rebuilds the cache
    # every that-many steps (1 = exact, tested token-identical to the
    # plain sampler); 0 = cache once.
    cached_cond: bool = False
    cached_cond_refresh: int = 0
    top_p: Optional[float] = None
    temperature: float = 1.0
    sampling_eps: float = 1e-5


@dataclass(frozen=True)
class MeshConfig:
    """Device mesh layout (reference: main.py:943-998 XLA SPMD mesh).

    Axes mirror the reference's ('dcn', 'fsdp', 'tensor') HybridMesh. A size
    of -1 means "all remaining devices".
    """

    dcn: int = 1  # multislice / DCN axis (data-parallel across slices)
    fsdp: int = -1  # parameter + batch sharding over ICI
    tensor: int = 1  # tensor parallelism
    # sequence (context) parallelism: shard activations over L and run
    # attention as an exact ppermute ring (parallel/ring_attention.py) —
    # memory per chip O(L/seq) for the >8k-token regime
    seq: int = 1
    # pipeline parallelism: shard the block stack depth-wise over 'pp'
    # stages; microbatches flow down a GPipe ppermute ring
    # (parallel/pipeline.py). Requires model.n_blocks % pp == 0.
    pp: int = 1
    # microbatches per pipeline round (bubble = (pp-1)/(mb+pp-1))
    pp_microbatches: int = 4
    # expert parallelism: MoE expert weights (model.moe_experts > 0)
    # shard their expert axis over 'ep'; token dispatch/combine become
    # XLA all_to_alls over ICI (models/moe.py)
    ep: int = 1

    def axis_names(self) -> Tuple[str, ...]:
        return ("dcn", "fsdp", "tensor", "seq", "pp", "ep")


@dataclass(frozen=True)
class DataConfig:
    dataset: str = "synthetic"
    data_dir: Optional[str] = None
    num_workers: int = 4
    # weighted multi-dataset sampling (reference: unidisc/datasets/sampler.py)
    dataset_weights: Optional[Tuple[float, ...]] = None


@dataclass(frozen=True)
class Config:
    model: ModelConfig = field(default_factory=ModelConfig)
    noise: NoiseConfig = field(default_factory=NoiseConfig)
    trainer: TrainerConfig = field(default_factory=TrainerConfig)
    sampling: SamplingConfig = field(default_factory=SamplingConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)
    data: DataConfig = field(default_factory=DataConfig)
    seed: int = 42

    # ------------------------------------------------------------------
    @staticmethod
    def make(model: str = "small", **overrides: Any) -> "Config":
        cfg = Config(model=MODEL_PRESETS[model])
        return cfg.override(**overrides)

    def apply_experiments(self, *names: str) -> "Config":
        """Compose experiment overlays (reference: +experiments='[...]')."""
        return _apply_experiments(self, *names)

    def override(self, **overrides: Any) -> "Config":
        """Apply dotted-path overrides, e.g. override(**{"model.n_blocks": 2})."""
        cfg = self
        for key, value in overrides.items():
            parts = key.split(".")
            if len(parts) == 1:
                cfg = replace(cfg, **{key: value})
            else:
                section = getattr(cfg, parts[0])
                for mid in parts[1:-1]:
                    section = getattr(section, mid)
                # rebuild from innermost out
                objs = [cfg]
                for p in parts[:-1]:
                    objs.append(getattr(objs[-1], p))
                new = replace(objs[-1], **{parts[-1]: value})
                for obj, p in zip(reversed(objs[:-1]), reversed(parts[:-1])):
                    new = replace(obj, **{p: new})
                cfg = new
        return cfg

    def validate(self) -> "Config":
        """Flag-combination legality checks (reference:
        _validate_configuration, model_setup.py:435-470). Returns self so
        CLIs can chain ``Config.make(...).validate()``; raises ValueError
        with the offending flags otherwise."""
        m, t, s = self.model, self.trainer, self.sampling
        errs = []
        if m.hidden_size % m.n_heads != 0:
            errs.append(f"hidden_size {m.hidden_size} not divisible by "
                        f"n_heads {m.n_heads}")
        if not t.interleaved and m.txt_length + m.img_length != m.length:
            errs.append(f"txt_length {m.txt_length} + img_length "
                        f"{m.img_length} != length {m.length} "
                        f"(non-interleaved layout)")
        if t.parameterization == "ar":
            if m.full_attention:
                errs.append("parameterization=ar needs "
                            "model.full_attention=False (causal)")
            if not t.ar_shift:
                errs.append("parameterization=ar needs trainer.ar_shift")
        if t.parameterization not in ("subs", "ar", "sedd", "d3pm"):
            errs.append(f"unknown parameterization {t.parameterization!r}")
        if t.importance_sampling and t.parameterization == "sedd":
            errs.append("sedd excludes importance_sampling (reference "
                        "model_setup.py:437-439)")
        if s.maskgit_dilation:
            side = int(round(m.img_length ** 0.5))
            if side * side != m.img_length:
                errs.append(f"maskgit_dilation needs a square image grid; "
                            f"img_length={m.img_length}")
        if s.cfg is not None and s.cfg < 0 and s.cfg != -1:
            errs.append("sampling.cfg must be >= 0 or the sweep "
                        "sentinel -1")
        if t.change_of_variables and t.importance_sampling:
            errs.append("change_of_variables excludes importance_sampling "
                        "(reference model_setup.py:436)")
        if t.discrete_diffusion_mode not in ("absorbing", "uniform"):
            errs.append(f"unknown discrete_diffusion_mode "
                        f"{t.discrete_diffusion_mode!r}")
        if m.moe_experts > 0:
            if m.moe_top_k < 1:
                errs.append("model.moe_top_k must be >= 1")
            ep = self.mesh.ep
            if ep > 1 and m.moe_experts % ep != 0:
                errs.append(f"model.moe_experts {m.moe_experts} not "
                            f"divisible by mesh.ep {ep}")
            if m.quant is not None and m.quant_fused:
                errs.append("moe_experts excludes quant_fused (the fused "
                            "prologue has no MoE path)")
        elif self.mesh.ep > 1:
            errs.append("mesh.ep > 1 needs model.moe_experts > 0 (the "
                        "'ep' axis only shards MoE expert weights)")
        if t.add_label and not m.add_labels:
            errs.append("trainer.add_label needs model.add_labels > 0 "
                        "(reference model.py:323)")
        if t.first_token_dropout is not None:
            # reference asserts, model_setup.py:450-455
            if not t.add_label or not m.add_labels:
                errs.append("first_token_dropout needs trainer.add_label "
                            "and model.add_labels > 0")
            if t.joint_ar_nar_prob is not None:
                errs.append("first_token_dropout excludes "
                            "joint_ar_nar_prob")
            if t.mask_entire_modality is not None:
                errs.append("first_token_dropout excludes "
                            "mask_entire_modality")
        if t.host_offload_optimizer:
            if m.mup:
                errs.append("host_offload_optimizer excludes model.mup "
                            "(per-path LR multipliers don't survive the "
                            "flat chunk re-keying, training/offload.py)")
            if t.grad_accum_steps != 1:
                errs.append("host_offload_optimizer excludes grad "
                            "accumulation — raise the per-step batch "
                            "instead (the freed HBM is the point)")
            if m.lora_rank > 0:
                errs.append("host_offload_optimizer excludes LoRA (the "
                            "adapter state is small — offload solves a "
                            "problem LoRA doesn't have)")
            if t.low_precision_params:
                errs.append("host_offload_optimizer excludes "
                            "low_precision_params (the offload keeps the "
                            "fp32 master that mode gives up)")
            if t.host_offload_chunks < 1:
                errs.append("host_offload_chunks must be >= 1")
        if m.mup and m.mup_base_width > m.hidden_size:
            errs.append(f"mup_base_width {m.mup_base_width} > hidden_size "
                        f"{m.hidden_size} (transfer goes small -> large)")
        if m.quant not in (None, "int8"):
            errs.append(f"unknown model.quant {m.quant!r}")
        if t.lr_schedule not in ("constant_warmup", "cosine_decay",
                                 "constant_warmup_cosine_decay",
                                 "cosine_hard_restarts"):
            errs.append(f"unknown lr_schedule {t.lr_schedule!r}")
        if m.cond_label and m.time_conditioning:
            errs.append("cond_label and time_conditioning are exclusive "
                        "conditioning paths")
        if m.img_cond:
            if not m.cond_image_vocab_size or not m.cond_length:
                errs.append("img_cond needs cond_image_vocab_size and "
                            "cond_length")
            if m.sandwich_normalization:
                # reference asserts (models/dit.py:931)
                errs.append("img_cond excludes sandwich_normalization")
            if m.qk_norm:
                # reference asserts (models/dit.py:688 "Not yet supported")
                errs.append("img_cond excludes qk_norm")
            if m.rope_2d or m.img_resolutions is not None:
                # the runnable reference reading uses plain 1D rotary for
                # the cond stream; 2D main rope would make the cross-attn
                # K rope ill-defined (models/dit.py:730-734 applies the
                # MAIN table's first cond_length rows to K_cond)
                errs.append("img_cond supports 1D rope only (rope_2d / "
                            "img_resolutions off)")
            if self.mesh.pp > 1 or self.mesh.seq > 1:
                errs.append("img_cond is not wired through pipeline/"
                            "sequence parallelism (the cond stream is "
                            "replicated, not L-sharded)")
        if self.mesh.seq > 1 and m.length % self.mesh.seq != 0:
            errs.append(f"model.length {m.length} not divisible by "
                        f"mesh.seq {self.mesh.seq} (sequence parallelism "
                        f"shards L evenly)")
        if self.mesh.pp > 1:
            if m.n_blocks % self.mesh.pp != 0:
                errs.append(f"model.n_blocks {m.n_blocks} not divisible "
                            f"by mesh.pp {self.mesh.pp}")
            # mesh.pp x mesh.seq composes since round 3: the L axis stays
            # sharded through the pipeline stage and the ring runs
            # directly in the stage body (models/dit.py
            # _inside_manual_mesh; parallel/pipeline.py seq_axis)
            if m.dropout > 0:
                errs.append("pipeline parallelism requires model."
                            "dropout=0 (per-stage block.apply carries "
                            "no dropout rngs)")
        if m.kv_cache_dtype not in ("bf16", "int8"):
            errs.append(f"unknown model.kv_cache_dtype "
                        f"{m.kv_cache_dtype!r}")
        if errs:
            raise ValueError("invalid configuration:\n  " +
                             "\n  ".join(errs))
        return self

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2, default=str)

    @staticmethod
    def from_json(s: str) -> "Config":
        raw = json.loads(s)

        def build(cls, d):
            kwargs = {}
            for f in dataclasses.fields(cls):
                if f.name not in d:
                    continue
                v = d[f.name]
                if dataclasses.is_dataclass(f.type) or f.name in _SECTIONS:
                    kwargs[f.name] = build(_SECTIONS[f.name], v)
                elif isinstance(v, list):
                    kwargs[f.name] = tuple(v)
                else:
                    kwargs[f.name] = v
            return cls(**kwargs)

        return build(Config, raw)


_SECTIONS = {
    "model": ModelConfig,
    "noise": NoiseConfig,
    "trainer": TrainerConfig,
    "sampling": SamplingConfig,
    "mesh": MeshConfig,
    "data": DataConfig,
}


# ---------------------------------------------------------------------------
# Experiment overlays (reference: configs/experiments/*.yaml, composed via
# +experiments='[...]'). Applied as dotted overrides on top of a preset:
#   Config.make("extra_large").apply_experiments("large_scale_train")
# ---------------------------------------------------------------------------
EXPERIMENTS = {
    # production 1.4B recipe (reference: configs/experiments/
    # large_scale_train.yaml:115-151; scripts/train_large_scale_slurm.sh)
    "large_scale_train": {
        "trainer.global_batch_size": 512,
        "trainer.lr": 1e-4,
        "trainer.warmup_steps": 10_000,
        "trainer.softmin_snr": 5.0,
        "trainer.text_loss_weight": 1.0,
        "trainer.img_loss_weight": 0.6,
        "trainer.mask_entire_modality": 0.15,
        "trainer.use_gradient_checkpointing": True,
        "trainer.multimodal_batches": True,
        "sampling.steps": 128,
        "sampling.cfg": 5.0,
        "model.force_argmax_valid_indices": True,
        "model.norm_type": "rms",
        "model.qk_norm": True,
        "model.sandwich_normalization": True,
        "model.modality_embed": True,
        "model.rope_2d": True,
        "model.time_conditioning": False,
    },
    # VQ-16 text->image 256px layout (reference: configs/experiments/
    # vq16_t2i.yaml:4-6 — 128 txt + 256 img tokens)
    "vq16_t2i": {
        "model.length": 384,
        "model.txt_length": 128,
        "model.img_length": 256,
        "model.image_vocab_size": 16384,
    },
    # FID-eval sampling recipe (reference: scripts/small_scale_eval.sh:31-34)
    "fid_eval": {
        "sampling.predictor": "maskgit",
        "sampling.cfg": 2.0,
        "sampling.steps": 128,
    },
    # AR baseline (reference: parameterization=ar + ar_shift + causal attn)
    "ar_baseline": {
        "trainer.parameterization": "ar",
        "trainer.ar_shift": True,
        "model.full_attention": False,
        "model.time_conditioning": False,
    },
    # quality-matched fast sampling: dilated unmasking at 8 NFE matched
    # or beat plain 32-NFE maskgit on the trained synthetic t2i A/B
    # (scripts/nfe_quality_ab.py, ROADMAP #9: token-acc 0.44 vs 0.32,
    # NLL 47.9 vs 39.9) — a ~4x NFE reduction preset for serving
    "fast_nfe": {
        "sampling.steps": 8,
        "sampling.maskgit_dilation": 2,
        "sampling.predictor": "maskgit",
    },
    # conditioning-frozen t2i serving: text K/V computed once, denoise
    # steps run image rows only (measured 1.2-1.3x at 1.4B, BASELINE.md;
    # composes with fast_nfe and int8)
    "frozen_cond": {
        "sampling.cached_cond": True,
        "sampling.cached_cond_refresh": 0,
        "sampling.predictor": "maskgit",
    },
    # CFG-distilled serving: single conditional forward per denoise step
    # (HALF the rows of the [cond||uncond] CFG batch). For checkpoints
    # trained/distilled with training/distill.py guidance= — the student
    # emits the guided posterior directly (quality gate:
    # scripts/cfg_distill_ab.py; BASELINE.md round 5). Composes with
    # frozen_cond + fast_nfe: the full stack measured 8,234 tok/s at
    # 1.4B int8 B4 (24.8x the host-synced loop).
    "cfg_distilled": {
        "sampling.cfg": None,
    },
    # the composed quality-gated serving stack (cfg_distilled +
    # frozen_cond + fast_nfe): --experiments distilled_stack
    "distilled_stack": {
        "sampling.cfg": None,
        "sampling.cached_cond": True,
        "sampling.cached_cond_refresh": 0,
        "sampling.steps": 8,
        "sampling.maskgit_dilation": 2,
        "sampling.predictor": "maskgit",
    },
    # 8192-token long-context stress layout (reference:
    # eval.big_seq_len_eval — model.py:158-168 swaps in synthetic
    # [4096 txt | 4096 img] batches for long-sequence speed evals; here
    # it is a first-class preset the eval harness / bench scripts apply)
    "big_seq_len_eval": {
        "model.length": 8192,
        "model.txt_length": 4096,
        "model.img_length": 4096,
        "sampling.steps": 32,
    },
    # interleaved variable-length training (reference:
    # configs/experiments/interleaved*.yaml)
    "interleaved": {
        "trainer.interleaved": True,
        "trainer.multimodal_batches": True,
        "model.modality_embed": True,
        "model.rope_2d": True,
    },
}


def _apply_experiments(cfg: "Config", *names: str) -> "Config":
    for name in names:
        if name not in EXPERIMENTS:
            raise KeyError(
                f"unknown experiment {name!r}; have {sorted(EXPERIMENTS)}")
        cfg = cfg.override(**EXPERIMENTS[name])
    return cfg


# Model size presets (reference: configs/model/{small,medium,large,extra_large,xxl}.yaml)
MODEL_PRESETS = {
    "tiny": ModelConfig(name="tiny", hidden_size=128, cond_dim=64, n_blocks=2,
                        n_heads=2, length=48, txt_length=16, img_length=32),
    "small": ModelConfig(name="small", hidden_size=768, cond_dim=128, n_blocks=12,
                         n_heads=12, length=1024, txt_length=128, img_length=896),
    "medium": ModelConfig(name="medium", hidden_size=1024, cond_dim=128, n_blocks=24,
                          n_heads=16, length=1024, txt_length=128, img_length=896),
    "large": ModelConfig(name="large", hidden_size=1280, cond_dim=128, n_blocks=28,
                         n_heads=20, length=1024, txt_length=128, img_length=896),
    # production 1.4B-class config (reference: configs/experiments/large_scale_train.yaml)
    "extra_large": ModelConfig(name="extra_large", hidden_size=2048, cond_dim=128,
                               n_blocks=24, n_heads=16, length=384, txt_length=128,
                               img_length=256, qk_norm=True, norm_type="rms",
                               sandwich_normalization=True, modality_embed=True,
                               rope_2d=True, force_argmax_valid_indices=True),
    "xxl": ModelConfig(name="xxl", hidden_size=4096, cond_dim=128, n_blocks=30,
                       n_heads=32, length=1024, txt_length=128, img_length=896),
}


# ---------------------------------------------------------------------------
# Config resolvers (reference: utils.py:314-396 OmegaConf resolvers —
# adjust_n_blocks, find_grad_accum, custom_batch_size; here plain helpers
# used by CLIs/scripts instead of string-interpolated hydra magic)
# ---------------------------------------------------------------------------

def adjust_n_blocks(base_n_blocks: int, backbone: str = "dit") -> int:
    """Param-count matching between backbones (reference utils.py:383-390):
    maskdit-style backbones carry adaLN parameters per block, so they drop
    1 block (<24) or 2 blocks (>=24) to match the plain-DIT budget."""
    if backbone == "maskdit":
        return base_n_blocks - (1 if base_n_blocks < 24 else 2)
    return base_n_blocks


def find_grad_accum(global_batch_size: int, per_device_batch_size: int,
                    n_devices: Optional[int] = None) -> int:
    """Accumulation steps to reach the global batch (reference
    find_grad_accum resolver)."""
    import jax
    n = n_devices if n_devices is not None else jax.device_count()
    per_step = per_device_batch_size * n
    return max(1, -(-global_batch_size // per_step))


# per-chip HBM (GB) -> suggested per-chip batch at the flagship 384-seq
# layout (reference custom_batch_size maps GPU memory to batch; numbers
# here from the measured v5e sweeps in BASELINE.md)
_HBM_BATCH_TABLE = {16: 16, 32: 32, 95: 64}


def custom_batch_size(hbm_gb: int = 16) -> int:
    keys = sorted(_HBM_BATCH_TABLE)
    best = keys[0]
    for k in keys:
        if hbm_gb >= k:
            best = k
    return _HBM_BATCH_TABLE[best]
