"""RS-GRPO training driver.

CLI parity with /root/reference/src/rsgrpo/verl/trainer/main.py +
run_rsgrpo.sh: `config=examples/config.yaml data.rollout_batch_size=32 ...`
style YAML + dotlist merge into the typed RLConfig tree; no Ray — the whole
loop is visrag_tpu.rl.trainer.RLTrainer in this process.

    python -m visrag_tpu.driver.rl_main --config rl.yaml \
        --data prompts.jsonl --checkpoint qwen_ckpt --output-dir out/ \
        --set rollout.n=8 --set actor.lr=1e-6
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default=None)
    ap.add_argument("--data", required=True,
                    help="jsonl rows {problem, answer, images?}")
    ap.add_argument("--val-data", default=None,
                    help="optional validation jsonl (same schema)")
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--output-dir", required=True)
    ap.add_argument("--set", action="append", default=[])
    # multi-host bootstrap (the reference's ray.init / torchrun role)
    ap.add_argument("--coordinator", default=None,
                    help="host:port of process 0 (multi-host runs)")
    ap.add_argument("--process-id", type=int, default=None)
    ap.add_argument("--num-processes", type=int, default=None)
    args = ap.parse_args(argv)

    import jax

    from ..mesh import init_distributed, multihost_mesh_config
    pid, nproc = init_distributed(args.coordinator, args.process_id,
                                  args.num_processes)
    from ..config import RLConfig, dump_config, load_config
    from ..data.datasets import RLHFDataset, batched
    from ..models.hf_loader import convert_qwen25_vl, load_safetensors_dir
    from ..models.qwen25_vl import Qwen25VL, Qwen25VLConfig
    from ..rl.trainer import RLTrainer
    from ..utils.tracker import Tracker

    cfg = load_config(RLConfig, yaml_path=args.config, dotlist=args.set)
    # checkpoints/tracker live under --output-dir (a stale default here sent
    # checkpoints to ./rl_output regardless of the flag — caught by the CLI
    # smoke test)
    cfg.trainer.output_dir = args.output_dir
    os.makedirs(args.output_dir, exist_ok=True)
    dump_config(cfg, os.path.join(args.output_dir, "run_config.json"))

    from .common import get_processor, get_tokenizer
    processor = get_processor(args.checkpoint)
    # text-only checkpoints have no processor (get_processor → None);
    # tokenizers also implement apply_chat_template, so fall back to it
    tok = processor.tokenizer if processor is not None \
        else get_tokenizer(args.checkpoint)
    if processor is None:
        processor = tok
    state = load_safetensors_dir(args.checkpoint)
    params = {"params": convert_qwen25_vl(state)}
    from .common import qwen_config_from_checkpoint
    mcfg = qwen_config_from_checkpoint(args.checkpoint, state)
    model = Qwen25VL(mcfg)

    # the reward manager owns the channel list + span-tag table; tags are
    # encoded for exactly the spans it declares (custom reward modules may
    # declare their own via REWARD_CHANNELS/CHANNEL_SPANS exports)
    from ..rl.reward_manager import RewardManager
    reward_manager = RewardManager(
        cfg.reward, max_response_length=cfg.rollout.max_response_length)
    tags = {t: tok.encode(t, add_special_tokens=False)
            for t in sorted(reward_manager.required_tags)}
    # ban the image token in rollout sampling (the reference's logit_bias
    # {image_token_id: -100}, vllm_rollout_spmd.py:42-49) — a sampled
    # <image> mid-response would enter the update with a dangling slot map
    banned = []
    image_token = getattr(processor, "image_token", None)
    if image_token is not None:
        banned.append(tok.convert_tokens_to_ids(image_token))

    from .common import encode_qwen_prompt_row

    def encode_row(row):
        return encode_qwen_prompt_row(row, processor, tok, mcfg, cfg.rollout)

    dataset = RLHFDataset(args.data, encode_row,
                          max_prompt_length=cfg.rollout.max_prompt_length)
    tracker = Tracker(args.output_dir)
    from ..mesh import build_mesh, multihost_mesh_config
    if cfg.actor.ulysses_size > 1:
        # size the mesh's seq axis from the SP knob (the reference's
        # ulysses_sequence_parallel_size → device_mesh, fsdp_workers.py:119)
        cfg.mesh.seq = cfg.actor.ulysses_size
        if cfg.actor.sp_backend != "ulysses":
            import dataclasses as _dc
            mcfg = _dc.replace(
                mcfg, text=_dc.replace(mcfg.text,
                                       sp_backend=cfg.actor.sp_backend))
            model = Qwen25VL(mcfg)
    if cfg.rollout.tensor_parallel_size > 1:
        # hybrid engine: the rollout serves TP over the mesh `model` axis
        # while the update stays FSDP over `data` (the reference's rollout
        # (dp, tp) mesh, fsdp_workers.py:331-350 + rollout.tensor_parallel_
        # size, vllm_rollout_spmd.py:106-127)
        cfg.mesh.model = cfg.rollout.tensor_parallel_size
    mcfg_mesh = multihost_mesh_config(cfg.mesh, nproc)
    mesh = build_mesh(mcfg_mesh) if len(jax.devices()) > 1 else None
    # long text prompts prefill chunk-at-a-time so running decodes never
    # stall a whole 15k-token forward (vision prompts run the tower once
    # and chunk the embeds); the prefix cache then reuses the shared
    # instruction prefix across the step's prompts (cleared on every
    # weight update by Engine.set_params)
    cpt = cfg.rollout.chunked_prefill_tokens
    if cpt is None and cfg.rollout.max_prompt_length >= 4096:
        cpt = 2048
    critic = None
    if cfg.algorithm.adv_estimator == "gae":
        # gae needs a learned value baseline: build the critic the way the
        # reference's driver does (main_ppo.py role="critic" worker — same
        # base model, fresh token-classification head, dp_critic.py). The
        # backbone is COPIED from the actor checkpoint (fresh buffers: the
        # critic trains and donates its params; sharing arrays with the
        # actor would invalidate them), the value head is the random init.
        import jax.numpy as jnp
        from ..models.qwen25_vl import QwenForValue
        from ..rl.critic import CriticTrainer
        vmodel = QwenForValue(mcfg.text)
        vparams = jax.jit(vmodel.init)(
            jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32),
            positions=jnp.zeros((3, 1, 8), jnp.int32))
        vparams["params"]["model"] = jax.tree_util.tree_map(
            jnp.array, params["params"]["model"])
        critic = CriticTrainer(
            vmodel, vparams, cfg.critic, mesh=mesh,
            global_batch_size=cfg.trainer.global_batch_size,
            total_steps=cfg.trainer.total_steps)
    trainer = RLTrainer(
        model, params, cfg, tokenizer_decode=lambda ids: tok.decode(ids),
        tokenizer_batch_decode=lambda seqs: tok.batch_decode(
            list(seqs),
            skip_special_tokens=cfg.reward.skip_special_tokens),
        reward_manager=reward_manager,
        tag_token_ids=tags, eos_token_ids=[tok.eos_token_id],
        engine_kwargs=dict(num_slots=8,
                           max_len=cfg.rollout.max_prompt_length +
                           cfg.rollout.max_response_length,
                           chunked_prefill_tokens=cpt,
                           prefix_cache=bool(cfg.rollout.prefix_cache
                                             and cpt is not None),
                           cache_dtype=cfg.rollout.kv_cache_dtype),
        mesh=mesh, banned_token_ids=banned, critic=critic)

    # checkpointable prompt cursor (StatefulDataLoader role): resume
    # continues at the exact dataset row with the saved rng
    from ..data.datasets import StatefulIterator
    row_iter = StatefulIterator(lambda: iter(dataset), cycle=True)
    trainer.data_iter = row_iter

    if trainer.maybe_resume():  # auto-resume (ray_trainer.py:346-373)
        print(f"resumed from step {trainer.step} "
              f"(data cursor {row_iter.state()})", file=sys.stderr)

    val_prompts = None
    if args.val_data:
        val_ds = RLHFDataset(args.val_data, encode_row,
                             max_prompt_length=cfg.rollout.max_prompt_length)
        val_prompts = list(val_ds)

    def prompt_batches():
        # cycling row cursor: epochs until total_steps, checkpointable
        yield from batched(row_iter, cfg.trainer.rollout_batch_size)

    trainer.fit(prompt_batches(), logger=lambda s, m: tracker.log(m, s),
                val_prompts=val_prompts, tracker=tracker)
    trainer.save()
    tracker.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
