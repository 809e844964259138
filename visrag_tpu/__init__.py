"""visrag_tpu — TPU-native vision-RAG framework (JAX / XLA / Pallas / pjit).

Rebuild of OpenBMB/VisRAG's capabilities with a TPU-first architecture:
  * page-image dense retrieval (VisRAG-Ret: SigLIP ViT + resampler + MiniCPM LM)
  * sharded on-TPU encode + exact top-k retrieval + IR metrics
  * contrastive training (cross-device negatives, GradCache) under pjit
  * VLM generation (VisRAG-Gen strategies, EVisRAG evidence pipeline)
  * RS-GRPO reinforcement learning as a single-controller pjit program
"""

__version__ = "0.1.0"
