"""simple_tad_tpu — a TPU-native JAX/Pallas framework for ego-centric Traffic
Anomaly Detection (TAD) on dashcam video.

Re-designed from scratch for TPU (JAX / XLA / Pallas / pjit) with the same
capabilities as the reference PyTorch codebase `tue-mps/simple-tad`
(ICCV 2025, "Simplifying Traffic Anomaly Detection with Video Foundation
Models"): VideoMAE-style video ViTs, domain-adaptive MAE pre-training,
frame-level anomaly fine-tuning, sliding-window evaluation and streaming
inference.

Key entry points:
  - ``simple_tad_tpu.models.create_model``          model registry
  - ``simple_tad_tpu.utils.torch_convert``          .pth -> JAX pytree converter
  - ``simple_tad_tpu.data``                         datasets, sequencers, loaders
  - ``simple_tad_tpu.train``                        optax training steps
  - ``simple_tad_tpu.eval``                         metrics + predictions writers
"""

__version__ = "0.1.0"

from simple_tad_tpu.models import create_model  # noqa: F401
