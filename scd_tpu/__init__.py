"""scd_tpu — a TPU-native Semantic Category Discovery framework.

A ground-up JAX/XLA/Pallas re-design of the SCD pipeline (cluster images with
semi-supervised / size-constrained k-means, then assign natural-language names
to clusters by iterative CLIP vocabulary voting), built for TPU device meshes:

- all hot compute (pairwise distances, E/M steps, vocabulary logits, top-k,
  vote histograms) runs on device, sharded over a ``jax.sharding.Mesh``;
- k-means restarts are a vmapped axis instead of a process pool;
- the cluster-size-constrained E-step has two interchangeable backends: an
  on-device Sinkhorn optimal-transport solver and a native C++ min-cost-flow
  (parity with the reference's OR-Tools formulation);
- CLIP ViT-B/16 image & text encoders are implemented in Flax with fused
  prompt-ensemble vocabulary embedding.

Reference behavior: Visual-AI/SCD (CVPR-W 2024), see SURVEY.md.
"""

__version__ = "0.1.0"

from scd_tpu.core.config import (  # noqa: F401
    ClusterConfig,
    DataConfig,
    NamingConfig,
    PipelineConfig,
)
