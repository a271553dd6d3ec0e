"""unidisc_tpu: TPU-native unified multimodal discrete diffusion framework.

A ground-up JAX/XLA/Pallas re-design with the capabilities of
alexanderswerdlow/unidisc (UniDisc, arXiv 2503.20853): joint text-image
absorbing-state masked diffusion with a DiT denoiser, classifier-free
guidance, confidence-based parallel unmasking, an AR baseline, GSPMD
mesh parallelism, and an end-to-end training/eval/serving stack.
"""

__version__ = "0.1.0"

from unidisc_tpu.config import (Config, MeshConfig, ModelConfig, NoiseConfig,
                                SamplingConfig, TrainerConfig, EXPERIMENTS,
                                MODEL_PRESETS)

__all__ = [
    "Config", "ModelConfig", "NoiseConfig", "MeshConfig", "SamplingConfig",
    "TrainerConfig", "EXPERIMENTS", "MODEL_PRESETS", "__version__",
]


def __getattr__(name):  # lazy heavy imports
    if name == "DIT":
        from unidisc_tpu.models.dit import DIT
        return DIT
    if name == "build_sampler":
        from unidisc_tpu.sampling.sampler import build_sampler
        return build_sampler
    if name == "Trainer":
        from unidisc_tpu.training.trainer import Trainer
        return Trainer
    if name == "InferenceEngine":
        from unidisc_tpu.serving.engine import InferenceEngine
        return InferenceEngine
    raise AttributeError(name)
