"""Analytic FLOPs + MFU accounting.

Parity with the reference FlopsCounter (/root/reference/src/rsgrpo/verl/utils/
flops_counter.py:56-133): dense ≈ 6·N·tokens for training (2 fwd + 4 bwd) and
attention 12·Σseq²·head_dim·heads·layers; chip peak table keyed by device
kind (TPU generations here instead of the reference's GPU table :24-53).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax

# peak dense bf16 TFLOP/s per chip
TPU_PEAK_TFLOPS = {
    "v4": 275.0,
    "v5e": 197.0,
    "v5p": 459.0,
    "v6e": 918.0,
    "cpu": 1.0,
}


def detect_peak_tflops() -> float:
    try:
        kind = jax.devices()[0].device_kind.lower()
    except Exception:
        return TPU_PEAK_TFLOPS["cpu"]
    for key, val in TPU_PEAK_TFLOPS.items():
        if key in kind.replace(" ", "").replace("lite", "e"):
            return val
    if "tpu" in kind:
        return TPU_PEAK_TFLOPS["v5e"]
    return TPU_PEAK_TFLOPS["cpu"]


@dataclasses.dataclass
class ModelDims:
    num_params: float                     # dense params (count)
    hidden_size: int
    num_layers: int
    num_heads: int

    @property
    def head_dim(self):
        return self.hidden_size // self.num_heads


def forward_flops(dims: ModelDims, total_tokens: int,
                  sum_seq_sq: Optional[float] = None) -> float:
    """2·N·tokens dense + 2·Σseq²·hidden·layers attention (fwd only)."""
    dense = 2.0 * dims.num_params * total_tokens
    attn = 0.0
    if sum_seq_sq:
        attn = 4.0 * sum_seq_sq * dims.hidden_size * dims.num_layers
    return dense + attn


def training_flops(dims: ModelDims, total_tokens: int,
                   sum_seq_sq: Optional[float] = None) -> float:
    """6·N·tokens dense + 12·Σseq²·d·h·L attention (flops_counter.py:83-116)."""
    dense = 6.0 * dims.num_params * total_tokens
    attn = 0.0
    if sum_seq_sq:
        attn = 12.0 * sum_seq_sq * dims.head_dim * dims.num_heads * dims.num_layers
    return dense + attn


def mfu(flops: float, seconds: float, n_chips: int = 1,
        peak_tflops: Optional[float] = None) -> float:
    peak = (peak_tflops or detect_peak_tflops()) * 1e12
    return flops / max(seconds, 1e-9) / (peak * n_chips)
