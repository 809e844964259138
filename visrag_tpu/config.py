"""Typed configuration tree: dataclasses + YAML + CLI dotlist merge.

One config system for the whole framework, replacing the reference's three styles
(HF dataclasses, OmegaConf structured configs, DeepSpeed JSON) — see SURVEY.md §5
"Config / flag system" and /root/reference/src/rsgrpo/verl/trainer/config.py.

Usage:
    cfg = load_config(RetrieverTrainConfig, yaml_path="run.yaml",
                      dotlist=["train.lr=1e-5", "model.pooling=wmean"])
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field, fields, is_dataclass
from typing import Any, Optional, Type, TypeVar

T = TypeVar("T")


def _coerce(value: Any, typ: Any) -> Any:
    """Coerce a YAML/CLI scalar into the annotated type."""
    import typing

    origin = typing.get_origin(typ)
    if origin is typing.Union:  # Optional[X]
        args = [a for a in typing.get_args(typ) if a is not type(None)]
        if value is None:
            return None
        return _coerce(value, args[0]) if len(args) == 1 else value
    if is_dataclass(typ):
        if isinstance(value, typ):
            return value
        if isinstance(value, dict):
            return from_dict(typ, value)
        raise TypeError(f"cannot build {typ} from {value!r}")
    if origin in (list, tuple):
        sub = typing.get_args(typ)
        if isinstance(value, str):
            value = [v for v in value.split(",") if v]
        out = [_coerce(v, sub[0]) if sub else v for v in value]
        return tuple(out) if origin is tuple else out
    if origin is dict:
        return dict(value)
    if typ is bool:
        if isinstance(value, bool):
            return value
        return str(value).lower() in ("1", "true", "yes", "on")
    if typ in (int, float, str):
        return typ(value)
    return value


def from_dict(cls: Type[T], data: dict) -> T:
    """Build a dataclass tree from a nested dict, coercing leaf types."""
    kwargs = {}
    known = {f.name: f for f in fields(cls)}
    for key, value in data.items():
        if key not in known:
            raise KeyError(f"unknown config key {key!r} for {cls.__name__}; "
                           f"valid: {sorted(known)}")
        kwargs[key] = _coerce(value, known[key].type_resolved
                              if hasattr(known[key], "type_resolved")
                              else _resolve_type(cls, known[key]))
    return cls(**kwargs)


def _resolve_type(cls, f) -> Any:
    import typing
    hints = typing.get_type_hints(cls)
    return hints.get(f.name, f.type)


def to_dict(cfg: Any) -> dict:
    """Dataclass tree → plain nested dict (for dumping)."""
    return dataclasses.asdict(cfg)


def merge_dotlist(cfg: T, dotlist: list[str]) -> T:
    """Apply `a.b.c=value` overrides onto a dataclass tree (returns a new tree)."""
    data = to_dict(cfg)
    for item in dotlist:
        if "=" not in item:
            raise ValueError(f"dotlist item {item!r} must be key=value")
        key, _, raw = item.partition("=")
        try:
            value = json.loads(raw)
        except json.JSONDecodeError:
            value = raw
        node = data
        parts = key.strip().split(".")
        for p in parts[:-1]:
            if p not in node or not isinstance(node[p], dict):
                raise KeyError(f"unknown config path {key!r} (at {p!r})")
            node = node[p]
        if parts[-1] not in node:
            raise KeyError(f"unknown config key {key!r}")
        node[parts[-1]] = value
    return from_dict(type(cfg), data)


def load_config(cls: Type[T], yaml_path: Optional[str] = None,
                dotlist: Optional[list[str]] = None, **defaults) -> T:
    """default ← yaml ← dotlist merge (mirrors rsgrpo's OmegaConf order)."""
    cfg = cls(**defaults)
    if yaml_path:
        import yaml

        with open(yaml_path) as f:
            data = yaml.safe_load(f) or {}
        base = to_dict(cfg)
        _deep_update(base, data)
        cfg = from_dict(cls, base)
    if dotlist:
        cfg = merge_dotlist(cfg, list(dotlist))
    if hasattr(cfg, "post_init"):
        cfg.post_init()
    return cfg


def _deep_update(base: dict, upd: dict) -> None:
    for k, v in upd.items():
        if k in base and isinstance(base[k], dict) and isinstance(v, dict):
            _deep_update(base[k], v)
        else:
            base[k] = v


def dump_config(cfg: Any, path: str) -> None:
    """Per-run config dump (JSON; YAML-compatible subset)."""
    with open(path, "w") as f:
        json.dump(to_dict(cfg), f, indent=2, default=str)


# ---------------------------------------------------------------------------
# Concrete config trees
# ---------------------------------------------------------------------------


@dataclass
class MeshConfig:
    """Device mesh layout. Axes: data (DP/FSDP over ICI), model (TP), seq (SP),
    replica (across DCN slices / HSDP outer axis)."""
    data: int = -1          # -1 = all remaining devices
    model: int = 1
    seq: int = 1
    replica: int = 1
    axis_names: tuple = ("replica", "data", "seq", "model")


@dataclass
class ModelConfig:
    """Which flagship model + numerics knobs."""
    name: str = "visrag-ret"   # visrag-ret | siglip | minicpmv | qwen25-vl
    checkpoint: str = ""        # HF-layout dir of safetensors, or ""
    dtype: str = "bfloat16"
    param_dtype: str = "bfloat16"
    pooling: str = "wmean"      # wmean|mean|lasttoken|cls|siglip_pooling
    attention: str = "causal"   # causal|bidirectional
    normalize: bool = True
    remat: bool = True          # jax.checkpoint on blocks
    max_inp_length: int = 2048


@dataclass
class DataConfig:
    corpus_path: str = ""
    query_path: str = ""
    qrels_path: str = ""
    query_template: str = "Represent this query for retrieving relevant documents: <query>"
    doc_template: str = "<text>"
    q_max_len: int = 512
    p_max_len: int = 2048
    batch_size: int = 16
    num_workers: int = 8
    seed: int = 42


@dataclass
class TrainConfig:
    lr: float = 5e-6
    weight_decay: float = 0.0
    warmup_ratio: float = 0.05
    epochs: int = 1
    max_steps: int = -1
    softmax_temperature: float = 0.02
    negatives_x_device: bool = True
    # accepted for reference parity (arguments.py:179, dense_trainer.py:437):
    # inbatch_loss=False and biaxial_loss=True are rejected at trainer build
    # (the reference raises NotImplementedError on biaxial_loss and silently
    # ignores inbatch_loss; here both misuses are loud)
    inbatch_loss: bool = True
    biaxial_loss: bool = False
    passage_stop_grad: bool = False
    grad_cache: bool = False
    grad_cache_micro_batch_size: int = 2
    n_passages: int = 1
    grad_clip: float = 1.0
    log_every: int = 10
    save_every: int = 500
    # LoRA (reference dense_retrieval_model.py:327-345); 0 = full finetune
    lora_rank: int = 0
    lora_alpha: float = 64.0
    # "bfloat16" halves Adam m/v memory with Kahan-compensated updates
    # (reference AnyPrecisionAdamW, torch_functional.py:204-339)
    optimizer_state_dtype: str = "float32"
    output_dir: str = "output"


@dataclass
class RetrievalConfig:
    depth: int = 10
    max_inmem_docs: int = 1_000_000
    trec_save_path: str = ""


@dataclass
class RetrieverTrainConfig:
    mesh: MeshConfig = field(default_factory=MeshConfig)
    model: ModelConfig = field(default_factory=ModelConfig)
    data: DataConfig = field(default_factory=DataConfig)
    train: TrainConfig = field(default_factory=TrainConfig)


@dataclass
class EvalConfig:
    mesh: MeshConfig = field(default_factory=MeshConfig)
    model: ModelConfig = field(default_factory=ModelConfig)
    data: DataConfig = field(default_factory=DataConfig)
    retrieval: RetrievalConfig = field(default_factory=RetrievalConfig)
    phase: str = "all"  # all | encode | retrieve | eval


# ---- RL (RS-GRPO) config tree, mirroring rsgrpo PPOConfig shape -------------


@dataclass
class RolloutConfig:
    n: int = 8
    temperature: float = 1.0
    top_p: float = 1.0
    # rollout TP degree (reference rollout.tensor_parallel_size,
    # vllm_rollout_spmd.py:106-127): sizes the mesh's `model` axis in
    # driver/rl_main — the Engine serves tensor-parallel while the update
    # stays FSDP over `data` (the hybrid engine)
    tensor_parallel_size: int = 1
    max_prompt_length: int = 15000
    max_response_length: int = 1536
    limit_images: int = 5
    min_pixels: int = 262144
    max_pixels: int = 1568000
    # rollout engine scheduling (vLLM enable_chunked_prefill /
    # enable_prefix_caching roles): chunked_prefill_tokens None = auto
    # (2048 when max_prompt_length ≥ 4096, else whole-prompt prefill);
    # prefix_cache reuses shared-instruction-prefix KV across the step's
    # prompts (cleared by Engine.set_params on every weight update — stale
    # KV can never serve post-update rollouts) and needs chunked prefill
    # (its resume mechanism)
    chunked_prefill_tokens: Optional[int] = None
    prefix_cache: bool = True
    # rollout KV-cache precision (the vLLM kv_cache_dtype role; the
    # reference pins bf16, rollout/config.py:31): "int8" halves decode-path
    # KV HBM traffic via per-token/kv-head absmax quantization
    # (serving/paged_kv.KVQuant). Rollout-only numerics: RL old/ref
    # logprobs are recomputed exactly by the packed full-precision pass
    kv_cache_dtype: str = "bfloat16"


@dataclass
class ActorConfig:
    lr: float = 1e-6
    # optimizer knobs the reference exposes per role (actor/config.py:44-52
    # OptimConfig): AdamW betas/weight_decay + constant-with-warmup LR
    # (fsdp_workers.py:309-316). lr_warmup_steps wins over lr_warmup_ratio
    # (× trainer.total_steps); warmup counts optimizer (minibatch) steps
    weight_decay: float = 1e-2
    betas: tuple = (0.9, 0.999)
    lr_warmup_ratio: float = 0.0
    lr_warmup_steps: Optional[int] = None
    ppo_epochs: int = 1
    clip_ratio_low: float = 0.2
    clip_ratio_high: float = 0.3
    clip_ratio_dual: float = 3.0
    kl_coef: float = 0.0
    kl_type: str = "low_var_kl"
    micro_batch_tokens: int = 16384
    freeze_vision_tower: bool = True
    # host-offload the frozen tower's weights outside the rollout/
    # vision-embed phases (the reference's param_offload role,
    # fsdp_workers.py FSDP cpu_offload — here scoped to the frozen
    # subtree, the only part whose HBM is pure ballast during the
    # update): frees ~1.34 GB for the 0.67B Qwen ViT. Measured on chip:
    # moves the 14.8k/5-image wall from the grad pass into the optimizer
    # apply but does NOT fit it single-chip (BASELINE.md round-5).
    # Costs one tower re-upload per step (relay-bound on this rig).
    offload_frozen_params: bool = False
    # host-offload the reference policy between its once-per-step logp
    # phase (the reference ref worker's param_offload, fsdp_workers.py
    # ref_policy cpu_offload): a 1.5B bf16 ref copy is 2.87 GiB of HBM
    # ballast during rollout/update. Single-host only (raises with mesh=).
    offload_ref_params: bool = False
    grad_clip: float = 1.0
    # "bfloat16" = AnyPrecisionAdamW role (bf16 m/v + Kahan; the knob the
    # reference uses to fit 3B+ actors — torch_functional.py:204-339)
    optimizer_state_dtype: str = "float32"
    # padding-free packed update path (segment-id attention); micro-batches
    # carrying vision inputs fall back to the padded layout
    padding_free: bool = True
    # Ulysses sequence parallelism degree for the update/logp forwards
    # (reference ulysses_sequence_parallel_size, fsdp_workers.py:119-129);
    # > 1 sizes the mesh's seq axis (driver/rl_main) and runs attention via
    # parallel/ulysses.sp_flash_attention
    ulysses_size: int = 1
    # "ulysses" | "ring": SP attention backend (ring = context parallelism
    # via ppermute k/v rotation — beyond the reference, no head-count bound)
    sp_backend: str = "ulysses"


@dataclass
class RewardConfig:
    """Pluggable rule-based reward (reference verl/workers/reward/config.py
    + function.py:47-105).

    reward_function: "path/to/file.py" or "path/to/file.py:fn_name" —
    importlib-loaded with loud errors on a missing file / attribute, exactly
    like FunctionRewardManager.__init__ (function.py:52-68). None = the
    in-tree evidencecot channels (rl/rewards.py), today's default behavior.
    reward_function_name: explicit fn name (wins over the ":name" suffix);
    None → ":name" split or "main" (config.py post_init :34-43).
    reward_type selects the manager: "batch" = span-scoped multi-channel
    (BatchFunctionRewardManager role; the loaded module may export
    REWARD_CHANNELS (tuple of names) and CHANNEL_SPANS (name →
    (start_tag|None, end_tag|None)) to override the evidencecot spans);
    "sequential" = one scalar per response (SequentialFunctionRewardManager's
    scalar-at-last-token — scoped over the whole response here, which is
    equivalent after the estimators broadcast the scalar advantage)."""
    reward_type: str = "batch"
    reward_function: Optional[str] = None
    reward_function_name: Optional[str] = None
    reward_function_kwargs: dict = field(default_factory=dict)
    skip_special_tokens: bool = True


@dataclass
class AlgorithmConfig:
    # router|grpo|rloo|reinforce_plus_plus|remax|gae all run end-to-end
    # (remax adds one greedy n=1 rollout per prompt batch as its baseline —
    # reference ray_trainer.py:497-509)
    adv_estimator: str = "router"
    gamma: float = 1.0
    lam: float = 1.0
    norm_adv_by_std: bool = True
    online_filtering: bool = False
    filter_key: str = "accuracy"
    filter_low: float = 0.01
    filter_high: float = 0.99
    max_try_make_batch: int = 10
    # reward-side KL penalty (applied when a reference policy exists and the
    # actor does NOT carry the KL in its loss — ray_trainer.py:636-638)
    use_kl_loss: bool = True
    kl_penalty: str = "kl"         # kl|abs|mse|low_var_kl
    kl_type: str = "fixed"         # fixed|adaptive controller
    kl_coef: float = 0.0
    kl_target: float = 0.1
    kl_horizon: float = 10000.0


@dataclass
class CriticConfig:
    lr: float = 1e-5
    # same optimizer surface as ActorConfig (critic/config.py shares
    # OptimConfig in the reference)
    weight_decay: float = 1e-2
    betas: tuple = (0.9, 0.999)
    lr_warmup_ratio: float = 0.0
    lr_warmup_steps: Optional[int] = None
    ppo_epochs: int = 1
    cliprange_value: float = 0.5
    grad_clip: float = 1.0
    micro_batch_tokens: int = 16384
    optimizer_state_dtype: str = "float32"


@dataclass
class RLTrainerConfig:
    total_steps: int = 100
    rollout_batch_size: int = 32
    global_batch_size: int = 32
    save_freq: int = 50
    val_freq: int = -1
    save_limit: int = 3
    critic_warmup: int = 0   # steps training only the critic (GAE path)
    # validation rollout overrides + gen-sample table size
    # (rollout.val_override_config / trainer.val_generations_to_log roles)
    val_n: int = 1
    val_temperature: float = 0.0
    val_generations_to_log: int = 3
    output_dir: str = "rl_output"


@dataclass
class RLConfig:
    mesh: MeshConfig = field(default_factory=MeshConfig)
    model: ModelConfig = field(default_factory=lambda: ModelConfig(name="qwen25-vl"))
    data: DataConfig = field(default_factory=DataConfig)
    rollout: RolloutConfig = field(default_factory=RolloutConfig)
    actor: ActorConfig = field(default_factory=ActorConfig)
    critic: CriticConfig = field(default_factory=CriticConfig)
    algorithm: AlgorithmConfig = field(default_factory=AlgorithmConfig)
    reward: RewardConfig = field(default_factory=RewardConfig)
    trainer: RLTrainerConfig = field(default_factory=RLTrainerConfig)
