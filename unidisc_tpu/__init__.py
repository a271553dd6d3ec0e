"""unidisc_tpu: TPU-native unified multimodal discrete diffusion framework.

A ground-up JAX/XLA/Pallas re-design with the capabilities of
alexanderswerdlow/unidisc (UniDisc, arXiv 2503.20853): joint text-image
absorbing-state masked diffusion with a DiT denoiser, classifier-free
guidance, confidence-based parallel unmasking, an AR baseline, GSPMD
mesh parallelism, and an end-to-end training/eval/serving stack.
"""

__version__ = "0.1.0"

from unidisc_tpu.config import Config, MeshConfig, ModelConfig, NoiseConfig

__all__ = ["Config", "ModelConfig", "NoiseConfig", "MeshConfig", "__version__"]
