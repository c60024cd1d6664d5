"""healnet_tpu: TPU-native multimodal fusion framework.

A ground-up JAX/XLA/Pallas re-design with the capabilities of the reference
HEALNet release (konst-int-i/healnet): the HealNet fusion architecture, survival
losses and metrics, the TCGA experiment pipeline, baseline model families,
explainability, and data-ops tooling — engineered for TPU (SPMD device meshes,
fused Pallas attention kernels, static-shape compilation).
"""

from healnet_tpu.models import HealNet, HealNetModule

__version__ = "0.4.0"

__all__ = ["HealNet", "HealNetModule", "__version__"]
