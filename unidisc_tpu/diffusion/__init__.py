from unidisc_tpu.diffusion.noise import (CosineNoise, CosineSqrNoise,
                                         GeometricNoise, LinearNoise,
                                         LogLinearNoise, get_noise)
from unidisc_tpu.diffusion.forward_process import (CorruptionResult,
                                                   mask_image_square,
                                                   mask_text_region, q_xt,
                                                   sample_t)
from unidisc_tpu.diffusion.subs import (NEG_INFINITY,
                                        restrict_modality_logits,
                                        subs_parameterization)
from unidisc_tpu.diffusion.loss import LossOutput, ar_loss, diffusion_loss, nelbo_weighting

__all__ = [
    "CosineNoise", "CosineSqrNoise", "GeometricNoise", "LinearNoise",
    "LogLinearNoise", "get_noise", "CorruptionResult", "mask_image_square",
    "mask_text_region",
    "q_xt", "sample_t", "NEG_INFINITY", "restrict_modality_logits",
    "subs_parameterization", "LossOutput", "ar_loss", "diffusion_loss",
    "nelbo_weighting",
]
