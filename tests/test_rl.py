"""RS-GRPO RL stack: reward parity, advantage parity, PPO-loss parity vs the
reference torch code (AST-extracted), seqlen balancing, tiny end-to-end fit."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from visrag_tpu.rl.advantage import (compute_advantage, grpo_advantage,
                                     rloo_advantage, router_advantage)
from visrag_tpu.rl.ppo import (average_loss, compute_kl, compute_policy_loss,
                               combine_channel_losses, log_probs_from_logits)
from visrag_tpu.rl.rewards import (REWARD_CHANNELS, accuracy_reward,
                                   build_reward_masks, compute_rewards,
                                   evidence_reward, find_first_subsequence,
                                   format_reward, is_observe_punishment,
                                   is_think_punishment, overlong_punishment,
                                   score_response)
from visrag_tpu.rl.seqlen import (balanced_partitions, balance_metrics,
                                  reorder_for_dp, token_budget_micro_batches)

from ref_oracle import load_functions

GOOD = ("<observe>img1 shows a chart</observe> <evidence>\n[1]: the 2020 "
        "value is 42\n[2]: no relevant information\n</evidence> <think>the "
        "answer is 42</think> <answer>42</answer>")
GT = "<evidence>[1]: the 2020 value is 42\n[2]: no relevant information</evidence><answer>42</answer>"


def _ref_reward_fns():
    import re, string
    from collections import Counter
    return load_functions(
        "src/rsgrpo/examples/reward_function/evidencecot.py",
        ["normalize_answer_qa", "f1_match", "em_match", "accuracy_reward",
         "evidence_reward", "format_reward", "soft_overlong_punishment",
         "isObserve_punishment", "isThink_punishment"],
        extra_ns={"re": re, "string": string, "Counter": Counter})


def test_reward_channels_match_reference():
    fns = _ref_reward_fns()
    cases = [(GOOD, GT), ("<answer>blue</answer>", "<answer>red</answer>"),
             ("no tags at all", GT),
             ("<observe>[1] is a chart</observe><evidence>[1]: x</evidence>"
              "<think>t</think><answer>t</answer>", GT)]
    for resp, gt in cases:
        assert accuracy_reward(resp, gt) == pytest.approx(
            fns["accuracy_reward"](resp, gt)), resp
        assert evidence_reward(resp, gt) == pytest.approx(
            fns["evidence_reward"](resp, gt)), resp
        assert format_reward(resp) == fns["format_reward"](resp, gt), resp
        assert is_observe_punishment(resp) == fns["isObserve_punishment"](resp)
        assert is_think_punishment(resp) == fns["isThink_punishment"](resp)
    for ln in (100, 300, 1100, 1400, 1600):
        assert overlong_punishment(ln) == fns["soft_overlong_punishment"](
            ln, 1536, 512, 200)


def test_score_response_weighting():
    s = score_response(GOOD, GT, 400)
    assert s["format"] == 1.0
    assert s["accuracy"] == pytest.approx(3.0)
    assert s["overall"] == pytest.approx(
        s["accuracy"] + s["evidence"] + s["format"] + s["overlong"] +
        s["isObserve"] + s["isThink"])


def test_reward_masks_spans():
    # tags as single tokens: <think>=50, <evidence>=51, <answer>=52
    tags = {"<think>": [50], "<evidence>": [51], "<answer>": [52]}
    ids = np.array([[9, 51, 9, 9, 50, 9, 52, 9, 0, 0]])
    rmask = np.array([[1, 1, 1, 1, 1, 1, 1, 1, 0, 0]])
    masks = build_reward_masks(ids, rmask, tags)
    ch = {c: i for i, c in enumerate(REWARD_CHANNELS)}
    # accuracy: <think>(pos 4) → end (valid)
    np.testing.assert_array_equal(masks[0, ch["accuracy"]],
                                  [0, 0, 0, 0, 1, 1, 1, 1, 0, 0])
    # evidence: start → <think>
    np.testing.assert_array_equal(masks[0, ch["evidence"]],
                                  [1, 1, 1, 1, 0, 0, 0, 0, 0, 0])
    # isObserve: start → <evidence>(pos 1)
    np.testing.assert_array_equal(masks[0, ch["isObserve"]],
                                  [1, 0, 0, 0, 0, 0, 0, 0, 0, 0])
    # isThink: <think> → <answer>
    np.testing.assert_array_equal(masks[0, ch["isThink"]],
                                  [0, 0, 0, 0, 1, 1, 0, 0, 0, 0])
    # format: full response
    np.testing.assert_array_equal(masks[0, ch["format"]], rmask[0])


def test_find_subsequence():
    row = np.array([1, 2, 3, 4, 2, 3])
    assert find_first_subsequence(row, np.array([2, 3])) == 1
    assert find_first_subsequence(row, np.array([3, 2])) == -1
    assert find_first_subsequence(row, np.array([9])) == -1


def test_router_advantage_vs_reference():
    import torch
    ref = load_functions("src/rsgrpo/verl/trainer/core_algos.py",
                         ["compute_router_outcome_advantage"],
                         extra_ns={"torch": torch, "Tuple": tuple})
    rng = np.random.default_rng(0)
    rewards = rng.normal(size=(8, 3)).astype(np.float32)
    index = np.array([0, 0, 0, 0, 1, 1, 1, 1])
    want, _ = ref["compute_router_outcome_advantage"](
        torch.tensor(rewards.copy()), torch.ones(8, 5), index)
    got, _ = router_advantage(rewards, index)
    np.testing.assert_allclose(got, want.numpy(), rtol=1e-4, atol=1e-5)


def test_grpo_advantage_vs_reference():
    import torch
    from collections import defaultdict
    ref = load_functions("src/rsgrpo/verl/trainer/core_algos.py",
                         ["compute_grpo_outcome_advantage"],
                         extra_ns={"torch": torch, "defaultdict": defaultdict,
                                   "Tuple": tuple})
    rng = np.random.default_rng(1)
    tok = rng.normal(size=(6, 7)).astype(np.float32)
    mask = (rng.random((6, 7)) > 0.3).astype(np.float32)
    index = np.array([0, 0, 0, 1, 1, 1])
    want, _ = ref["compute_grpo_outcome_advantage"](
        torch.tensor(tok.copy()), torch.tensor(mask), index)
    got, _ = grpo_advantage(tok, mask, index)
    np.testing.assert_allclose(got, want.numpy(), rtol=1e-4, atol=1e-5)


def test_policy_loss_vs_reference():
    import torch
    import numpy as _np

    class VF:
        @staticmethod
        def masked_mean(x, m, eps=1e-8):
            if not torch.is_tensor(x) or x.dim() == 0:
                return torch.as_tensor(x)
            while m.dim() < x.dim():
                m = m.unsqueeze(1)
            m = m.expand_as(x)
            return (x * m).sum() / (m.sum() + eps)

    def ref_average_loss(values, mask, mode, eps=1e-8):
        if mode == "router":
            return (values * mask).sum(dim=(0, 2)) / (mask.sum(dim=(0, 2)) + eps)
        return VF.masked_mean(values, mask, eps=eps)

    ref = load_functions(
        "src/rsgrpo/verl/trainer/core_algos.py", ["compute_policy_loss"],
        extra_ns={"torch": torch, "np": _np, "VF": VF,
                  "average_loss": ref_average_loss, "Tuple": tuple,
                  "Dict": dict, "Literal": __import__("typing").Literal})

    rng = np.random.default_rng(2)
    bs, n, ln = 4, 3, 9
    old = rng.normal(size=(bs, ln)).astype(np.float32) * 0.1 - 2
    new = old + rng.normal(size=(bs, ln)).astype(np.float32) * 0.2
    adv = rng.normal(size=(bs, n)).astype(np.float32)
    rmask = (rng.random((bs, n, ln)) > 0.3).astype(np.float32)
    resp_mask = np.ones((bs, ln), np.float32)

    want, want_m = ref["compute_policy_loss"](
        torch.tensor(old), torch.tensor(new), torch.tensor(adv),
        torch.tensor(resp_mask), torch.tensor(rmask), 0.2, 0.3, 3.0, "token")
    got, got_m = compute_policy_loss(
        jnp.asarray(old), jnp.asarray(new), jnp.asarray(adv),
        jnp.asarray(resp_mask), jnp.asarray(rmask),
        clip_ratio_low=0.2, clip_ratio_high=0.3, clip_ratio_dual=3.0)
    np.testing.assert_allclose(np.asarray(got), want.numpy(), rtol=1e-4,
                               atol=1e-5)
    for k in ("pg_clipfrac_higher", "pg_clipfrac_lower", "ppo_kl"):
        assert float(got_m[k]) == pytest.approx(want_m[k], abs=1e-4), k


def test_chunked_token_log_probs_matches_naive():
    """chunked fused linear+CE == naive (B,S,V) path, values AND grads
    (hidden + head weights) — the 15k-geometry memory fix must be exact."""
    from visrag_tpu.rl.ppo import chunked_token_log_probs

    rng = np.random.default_rng(5)
    B, S, H, V = 2, 333, 16, 50          # S not a multiple of the chunk
    hidden = jnp.asarray(rng.normal(size=(B, S, H)), jnp.float32)
    W = jnp.asarray(rng.normal(size=(H, V)) * 0.1, jnp.float32)
    labels = jnp.asarray(rng.integers(0, V, size=(B, S)), jnp.int32)
    mask = jnp.asarray(rng.random((B, S)) > 0.3, jnp.float32)

    def naive(h, w):
        lp = log_probs_from_logits(h @ w, labels)
        return lp, jnp.sum(lp * mask)

    def chunked(h, w):
        lp = chunked_token_log_probs(lambda x: x @ w, h, labels, chunk=128)
        return lp, jnp.sum(lp * mask)

    lp_n, _ = naive(hidden, W)
    lp_c, _ = chunked(hidden, W)
    np.testing.assert_allclose(np.asarray(lp_c), np.asarray(lp_n),
                               rtol=1e-5, atol=1e-5)
    gn = jax.grad(lambda h, w: naive(h, w)[1], argnums=(0, 1))(hidden, W)
    gc = jax.grad(lambda h, w: chunked(h, w)[1], argnums=(0, 1))(hidden, W)
    for a, b in zip(gn, gc):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-5)


def test_kl_variants():
    lp = jnp.asarray([[0.0, -1.0]])
    ref = jnp.asarray([[-0.5, -0.5]])
    assert np.allclose(np.asarray(compute_kl(lp, ref, "kl")), [[0.5, -0.5]])
    lv = np.asarray(compute_kl(lp, ref, "low_var_kl"))
    assert (lv >= 0).all()  # low-var estimator is nonnegative


def test_seqlen_balancing():
    rng = np.random.default_rng(3)
    lens = rng.integers(10, 1000, size=32).tolist()
    groups = balanced_partitions(lens, 8, equal_size=True)
    assert sorted(i for g in groups for i in g) == list(range(32))
    assert all(len(g) == 4 for g in groups)
    m = balance_metrics(lens, groups)
    assert m["imbalance"] < 2.0
    perm = reorder_for_dp(lens, 8)
    assert sorted(perm.tolist()) == list(range(32))
    micro, restore = token_budget_micro_batches(lens, max_tokens=1500)
    flat = [i for g in micro for i in g]
    assert sorted(flat) == list(range(32))
    assert [flat[r] for r in restore] == list(range(32))
    assert all(sum(lens[i] for i in g) <= 1500 or len(g) == 1 for g in micro)


def test_rl_fit_smoke():
    """Tiny Qwen + synthetic prompts: one full RS-GRPO step runs, metrics are
    finite, params change."""
    from test_qwen25_vl import _hf_tiny
    from visrag_tpu.config import RLConfig, RolloutConfig, RLTrainerConfig
    from visrag_tpu.models.hf_loader import convert_qwen25_vl
    from visrag_tpu.models.qwen25_vl import Qwen25VL, Qwen25VLConfig
    from visrag_tpu.rl.trainer import RLTrainer

    ref, _ = _hf_tiny()
    params = {"params": convert_qwen25_vl(
        {k: v for k, v in ref.state_dict().items()})}
    model = Qwen25VL(Qwen25VLConfig.tiny())

    cfg = RLConfig()
    cfg = dataclass_replace(cfg)
    rng = np.random.default_rng(4)
    prompts = [dict(input_ids=rng.integers(0, 100, size=(6,)).astype(np.int32),
                    ground_truth="<answer>x</answer>") for _ in range(2)]

    # decode yields group-varying accuracy so advantages are nonzero
    def decode(ids):
        return "<answer>x</answer>" if sum(ids) % 2 == 0 else "wrong"

    trainer = RLTrainer(
        model, params, cfg,
        tokenizer_decode=decode,
        tag_token_ids={"<think>": [50], "<evidence>": [51], "<answer>": [52]},
        engine_kwargs=dict(num_slots=4, max_len=64, prompt_buckets=(16,)))
    before = [np.asarray(x).copy()
              for x in jax.tree_util.tree_leaves(params["params"])]
    hist = trainer.fit([prompts])
    assert len(hist) == 1
    step, m = hist[0]
    assert np.isfinite(m["loss"]) and np.isfinite(m["grad_norm"])
    after = [np.asarray(x)
             for x in jax.tree_util.tree_leaves(trainer.params["params"])]
    if m["grad_norm"] > 0:
        assert any((a != b).any() for a, b in zip(before, after))


def dataclass_replace(cfg):
    import dataclasses
    return dataclasses.replace(
        cfg,
        rollout=dataclasses.replace(cfg.rollout, n=4, max_response_length=8,
                                    temperature=1.0),
        trainer=dataclasses.replace(cfg.trainer, total_steps=1,
                                    rollout_batch_size=2))


def test_packed_forward_equals_padded():
    """Packed segment-id forward == per-sequence padded forward (the
    padding-free training path)."""
    from test_qwen25_vl import _hf_tiny
    from visrag_tpu.models.hf_loader import convert_qwen25_vl
    from visrag_tpu.models.qwen25_vl import QwenTextConfig, QwenTextModel
    from visrag_tpu.rl.packing import pack_sequences, unpack

    ref, _ = _hf_tiny()
    params = convert_qwen25_vl(
        {k: v for k, v in ref.state_dict().items()})["model"]
    model = QwenTextModel(QwenTextConfig.tiny())

    rng = np.random.default_rng(0)
    seqs = [rng.integers(0, 100, size=(n,)).astype(np.int32)
            for n in (9, 5, 7, 3)]
    packed, _ = pack_sequences(seqs, width=16)
    hidden_packed = model.apply(
        {"params": params}, jnp.asarray(packed.input_ids),
        positions=jnp.asarray(packed.positions),
        segment_ids=jnp.asarray(packed.segment_ids))
    outs = unpack(np.asarray(hidden_packed), packed.layout)

    for s, got in zip(seqs, outs):
        want = np.asarray(model.apply({"params": params},
                                      jnp.asarray(s[None])))[0]
        np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4)


def test_pack_layout_roundtrip():
    from visrag_tpu.rl.packing import pack_sequences, unpack
    seqs = [np.arange(1, 6), np.arange(10, 13), np.arange(20, 28)]
    extra = {"mask": [np.ones_like(s) for s in seqs]}
    packed, ex = pack_sequences(seqs, width=8, extra=extra)
    back = unpack(packed.input_ids, packed.layout)
    for s, b in zip(seqs, back):
        np.testing.assert_array_equal(s, b)
    assert (packed.segment_ids > 0).sum() == sum(len(s) for s in seqs)
    assert ex["mask"].shape == packed.input_ids.shape


def test_reward_channels_fuzz_vs_oracle():
    """~1000 random tag-soup pairs through all six channels vs the
    AST-extracted reference (VERDICT weak #2: repeated tokens exercise
    set-vs-multiset F1; padded evidence strings exercise substring EM)."""
    import random

    fns = _ref_reward_fns()
    rng = random.Random(20260816)
    # repeated + punctuation-heavy tokens to stress normalization & set-F1
    words = ["42", "42", "chart", "value", "value", "no", "relevant",
             "information", "the", "a", "an", "blue", "red", "2020", "11%",
             "x,y", "total:", "...", "N/A", "α-β", "it's"]

    def phrase(lo, hi):
        return " ".join(rng.choices(words, k=rng.randint(lo, hi)))

    def evidence_body(n_slots, pad):
        lines = []
        for i in range(n_slots):
            gold = rng.choice(["no relevant information",
                               phrase(1, 4), phrase(5, 9)])
            suffix = "   " if pad and rng.random() < 0.5 else ""
            lines.append(f"[{i + 1}]: {gold}{suffix}")
        return "\n".join(lines)

    def random_response():
        parts = []
        if rng.random() < 0.9:
            obs = phrase(2, 6) + (f" [{rng.randint(1, 5)}] " if
                                  rng.random() < 0.3 else "")
            parts.append(f"<observe>{obs}</observe>")
        if rng.random() < 0.9:
            parts.append(f"<evidence>{evidence_body(rng.randint(0, 6), True)}"
                         "</evidence>")
        think = phrase(1, 8)
        ans = rng.choice([phrase(1, 3), phrase(5, 8), think])
        if rng.random() < 0.9:
            parts.append(f"<think>{think}</think>")
        if rng.random() < 0.9:
            parts.append(f"<answer>{ans}</answer>")
        if rng.random() < 0.15 and parts:  # duplicate a tag block
            parts.append(rng.choice(parts))
        if rng.random() < 0.15:  # junk between blocks
            parts.insert(rng.randint(0, len(parts)), phrase(1, 3))
        rng.shuffle(parts) if rng.random() < 0.1 else None
        return rng.choice(["", " ", "\n"]).join(parts)

    for trial in range(1000):
        gt = (f"<evidence>{evidence_body(rng.randint(1, 5), False)}"
              f"</evidence><answer>{phrase(1, 6)}</answer>")
        resp = random_response()
        rl = rng.randint(0, 1800)
        assert accuracy_reward(resp, gt) == pytest.approx(
            fns["accuracy_reward"](resp, gt)), (trial, resp, gt)
        assert evidence_reward(resp, gt) == pytest.approx(
            fns["evidence_reward"](resp, gt)), (trial, resp, gt)
        assert format_reward(resp) == fns["format_reward"](resp, gt), resp
        assert is_observe_punishment(resp) == fns["isObserve_punishment"](resp)
        assert is_think_punishment(resp) == fns["isThink_punishment"](resp)
        assert overlong_punishment(rl) == fns["soft_overlong_punishment"](
            rl, 1536, 512, 200)


def _synth_train_batch(rng, bs=8, S=24, vocab=100, nch=6):
    """Synthetic post-rollout batch (pre-old_log_probs)."""
    ids = rng.integers(1, vocab, size=(bs, S)).astype(np.int32)
    lens = rng.integers(10, S + 1, size=bs)
    plens = rng.integers(2, 6, size=bs)
    att = np.zeros((bs, S), np.int32)
    resp = np.zeros((bs, S), np.int32)
    for i in range(bs):
        att[i, :lens[i]] = 1
        resp[i, plens[i]:lens[i]] = 1
        ids[i, lens[i]:] = 0
    pos = np.broadcast_to(np.arange(S), (3, bs, S)).copy().astype(np.int32)
    rm = np.repeat(resp[:, None, :], nch, axis=1).copy()
    # channel scopes: vary starts so channels differ
    for i in range(bs):
        for c in range(nch):
            cut = plens[i] + c % 3
            rm[i, c, :cut] = 0
    adv = rng.normal(size=(bs, nch)).astype(np.float32)
    return dict(input_ids=ids, attention_mask=att,
                positions=pos, response_mask=resp, reward_masks=rm,
                advantages=adv,
                reward_tensor=rng.normal(size=(bs, nch)).astype(np.float32),
                uid=np.repeat(np.arange(bs // 2), 2))


def _tiny_trainer(mesh=None, padding_free=False, text_over=None, **over):
    import dataclasses as dc

    from test_qwen25_vl import _hf_tiny
    from visrag_tpu.config import RLConfig
    from visrag_tpu.models.hf_loader import convert_qwen25_vl
    from visrag_tpu.models.qwen25_vl import Qwen25VL, Qwen25VLConfig
    from visrag_tpu.rl.trainer import RLTrainer

    ref, _ = _hf_tiny()
    params = {"params": convert_qwen25_vl(
        {k: v for k, v in ref.state_dict().items()})}
    mcfg = Qwen25VLConfig.tiny()
    if text_over:
        mcfg = dc.replace(mcfg, text=dc.replace(mcfg.text, **text_over))
    model = Qwen25VL(mcfg)
    cfg = RLConfig()
    cfg = dc.replace(cfg, actor=dc.replace(cfg.actor, lr=1e-3,
                                           padding_free=padding_free, **over))
    return RLTrainer(model, params, cfg, tokenizer_decode=lambda x: "",
                     tag_token_ids={"<think>": [50], "<evidence>": [51],
                                    "<answer>": [52]}, mesh=mesh)


def test_rl_update_sharded_matches_single():
    """A DP+FSDP-sharded update_policy on the 8-device mesh produces the
    same params as the single-device step (VERDICT #3 done-criterion)."""
    from visrag_tpu.config import MeshConfig
    from visrag_tpu.mesh import build_mesh

    rng = np.random.default_rng(7)
    batch = _synth_train_batch(rng)
    t1 = _tiny_trainer(mesh=None)
    t8 = _tiny_trainer(mesh=build_mesh(MeshConfig(data=8)))
    for t in (t1, t8):
        b = dict(batch)
        b["old_log_probs"] = t.compute_log_probs(t.params, b)
        t.update_policy(b)
    p1 = jax.tree_util.tree_leaves(t1.params["params"])
    p8 = jax.tree_util.tree_leaves(t8.params["params"])
    for a, b in zip(p1, p8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


def test_rl_packed_update_matches_padded():
    """padding_free (segment-id packed) update == padded update."""
    rng = np.random.default_rng(11)
    batch = _synth_train_batch(rng)
    tp = _tiny_trainer(padding_free=True)
    td = _tiny_trainer(padding_free=False)
    for t in (tp, td):
        b = dict(batch)
        b["old_log_probs"] = t.compute_log_probs(t.params, b)
        t.update_policy(b)
    for a, b in zip(jax.tree_util.tree_leaves(tp.params["params"]),
                    jax.tree_util.tree_leaves(td.params["params"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("backend", ["ulysses", "ring"])
def test_rl_packed_update_sp_matches(backend):
    """actor.ulysses_size=4: the packed update (and compute_log_probs) on a
    (data=2, seq=4) mesh produces the same params as the sp=1 update —
    SP wired into a real train path (VERDICT next-round #4), for both the
    Ulysses all_to_all backend and the ring ppermute backend."""
    from visrag_tpu.config import MeshConfig
    from visrag_tpu.mesh import build_mesh

    rng = np.random.default_rng(17)
    batch = _synth_train_batch(rng)
    t1 = _tiny_trainer(padding_free=True)
    tsp = _tiny_trainer(mesh=build_mesh(MeshConfig(data=2, seq=4)),
                        padding_free=True, ulysses_size=4,
                        sp_backend=backend,
                        text_over={"sp_backend": backend})
    assert tsp.sp == 4
    for t in (t1, tsp):
        b = dict(batch)
        b["old_log_probs"] = t.compute_log_probs(t.params, b)
        t.update_policy(b)
    for a, b in zip(jax.tree_util.tree_leaves(t1.params["params"]),
                    jax.tree_util.tree_leaves(tsp.params["params"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


def test_make_batch_fresh_prompts():
    """Online filtering pulls NEW prompt groups per retry with globally
    unique uids (VERDICT weak #3 / next-step 6)."""
    import dataclasses as dc

    from visrag_tpu.rl.trainer import RLTrainer, RolloutBatch

    class StubTrainer(RLTrainer):
        def __init__(self, cfg):
            # bypass model/optimizer setup; make_batch only needs cfg,
            # tag ids, uid counter, and rollout()
            self.cfg = cfg
            self.tag_token_ids = {"<think>": [50], "<evidence>": [51],
                                  "<answer>": [52]}
            from visrag_tpu.rl.reward_manager import RewardManager
            self.reward_manager = RewardManager(
                cfg.reward,
                max_response_length=cfg.rollout.max_response_length)
            self.channels = self.reward_manager.channels
            self._uid_next = 0
            self.consumed = []

        def rollout(self, prompts, rng):
            n = self.cfg.rollout.n
            self.consumed.append([p["name"] for p in prompts])
            uids, texts, gts, resp = [], [], [], []
            for p in prompts:
                uid = self._uid_next
                self._uid_next += 1
                for j in range(n):
                    uids.append(uid)
                    texts.append(p["texts"][j])
                    gts.append(p["ground_truth"])
                    resp.append([5, 6, 7])
            bs, S = len(uids), 8
            ids = np.ones((bs, S), np.int32)
            att = np.ones((bs, S), np.int32)
            rm = np.zeros((bs, S), np.int32)
            rm[:, 5:] = 1
            pos = np.broadcast_to(np.arange(S), (3, bs, S)).copy()
            return RolloutBatch(input_ids=ids, attention_mask=att,
                                positions=pos.astype(np.int32),
                                response_mask=rm, responses=resp,
                                response_texts=texts, uid=np.asarray(uids),
                                ground_truths=gts)

    from visrag_tpu.config import RLConfig
    cfg = RLConfig()
    cfg = dc.replace(
        cfg,
        rollout=dc.replace(cfg.rollout, n=2),
        # the accuracy channel is 3-weighted (sum_all), so a perfect group
        # means 3.0 and a half-right group 1.5
        algorithm=dc.replace(cfg.algorithm, online_filtering=True,
                             filter_key="accuracy", filter_low=0.01,
                             filter_high=2.9, max_try_make_batch=5),
        trainer=dc.replace(cfg.trainer, rollout_batch_size=2))
    tr = StubTrainer(cfg)
    gt = "<answer>yes maybe sure ok</answer>"
    perfect = [gt, gt]                           # acc mean 1.0 → filtered
    mixed = [gt, "<answer>zzz</answer>"]         # acc mean 0.5 → kept
    batches = iter([
        [dict(name="a", texts=perfect, ground_truth=gt),
         dict(name="b", texts=perfect, ground_truth=gt)],
        [dict(name="c", texts=mixed, ground_truth=gt),
         dict(name="d", texts=mixed, ground_truth=gt)],
    ])
    out = tr.make_batch(batches, jax.random.PRNGKey(0))
    # regeneration consumed FRESH prompts, not re-rolls of the first batch
    assert tr.consumed == [["a", "b"], ["c", "d"]]
    uids, counts = np.unique(out["uid"], return_counts=True)
    assert (counts == cfg.rollout.n).all()       # whole groups, no dup uids
    assert set(uids) == {2, 3}                   # uids globally unique: try 2
    assert out["input_ids"].shape[0] == 4


def test_value_loss_matches_reference():
    import torch
    from visrag_tpu.rl.ppo import compute_value_loss

    class _VF:
        @staticmethod
        def masked_mean(x, mask, dim=None, eps=1e-8):
            return (x * mask).sum(dim) / (mask.sum(dim) + eps)

    from ref_oracle import load_functions
    fns = load_functions(
        "src/rsgrpo/verl/trainer/core_algos.py",
        ["average_loss", "compute_value_loss"],
        extra_ns={"torch": torch, "VF": _VF, "Tuple": tuple, "Dict": dict,
                  "Literal": __import__("typing").Literal})
    rng = np.random.default_rng(5)
    vp = rng.normal(size=(4, 12)).astype(np.float32)
    ret = rng.normal(size=(4, 12)).astype(np.float32)
    val = vp + rng.normal(scale=0.7, size=(4, 12)).astype(np.float32)
    mask = (rng.random((4, 12)) > 0.3).astype(np.float32)
    want, wm = fns["compute_value_loss"](
        torch.tensor(vp), torch.tensor(ret), torch.tensor(val),
        torch.tensor(mask), 0.5, "token")
    got, gm = compute_value_loss(jnp.asarray(vp), jnp.asarray(ret),
                                 jnp.asarray(val), jnp.asarray(mask),
                                 cliprange_value=0.5)
    assert float(got) == pytest.approx(float(want), rel=1e-5)
    assert float(gm["vf_clipfrac"]) == pytest.approx(
        float(wm["vf_clipfrac"]), rel=1e-5)


def test_adaptive_kl_controller_matches_reference():
    import abc
    from ref_oracle import load_functions
    from visrag_tpu.rl.ppo import AdaptiveKLController, get_kl_controller
    fns = load_functions(
        "src/rsgrpo/verl/trainer/core_algos.py",
        ["KLController", "AdaptiveKLController"],
        extra_ns={"ABC": abc.ABC, "abstractmethod": abc.abstractmethod,
                  "np": np})
    ref = fns["AdaptiveKLController"](0.2, 0.1, 1000.0)
    ours = AdaptiveKLController(0.2, 0.1, 1000.0)
    for kl, n in ((0.05, 16), (0.4, 8), (0.1, 32), (0.0, 4)):
        ref.update(kl, n)
        ours.update(kl, n)
        assert ours.kl_coef == pytest.approx(ref.kl_coef, rel=1e-6)
    assert get_kl_controller("fixed", 0.3).kl_coef == 0.3


@pytest.mark.parametrize("with_vision", [False, True])
def test_rl_gae_critic_path(with_vision):
    """GAE estimator end-to-end: critic values → advantages/returns →
    actor + clipped critic updates, with the adaptive reward-KL penalty.
    with_vision=True runs EVisRAG-style image prompts: the critic consumes
    the frozen-tower vision_embeds table through its value model (reference
    dp_critic.py:64-117 multi_modal_inputs), and its values must differ
    from the text-blind ones (VERDICT round-3 missing #1)."""
    import dataclasses as dc

    from test_qwen25_vl import _hf_tiny
    from visrag_tpu.config import RLConfig
    from visrag_tpu.models.hf_loader import convert_qwen25_vl
    from visrag_tpu.models.qwen25_vl import (Qwen25VL, Qwen25VLConfig,
                                             QwenForValue, QwenTextConfig)
    from visrag_tpu.rl.critic import CriticTrainer
    from visrag_tpu.rl.trainer import RLTrainer

    ref, _ = _hf_tiny()
    params = {"params": convert_qwen25_vl(
        {k: v for k, v in ref.state_dict().items()})}
    model = Qwen25VL(Qwen25VLConfig.tiny())

    vcfg = QwenTextConfig.tiny()
    vmodel = QwenForValue(vcfg)
    vparams = vmodel.init(jax.random.PRNGKey(1),
                          jnp.zeros((1, 8), jnp.int32),
                          positions=jnp.zeros((3, 1, 8), jnp.int32))

    cfg = RLConfig()
    cfg = dc.replace(
        cfg,
        rollout=dc.replace(cfg.rollout, n=4, max_response_length=8),
        algorithm=dc.replace(cfg.algorithm, adv_estimator="gae",
                             use_kl_loss=False, kl_type="adaptive",
                             kl_coef=0.1, kl_target=0.1, kl_horizon=100.0),
        trainer=dc.replace(cfg.trainer, total_steps=1, rollout_batch_size=2))
    critic = CriticTrainer(vmodel, vparams, cfg.critic,
                           global_batch_size=cfg.trainer.global_batch_size)
    trainer = RLTrainer(
        model, params, cfg,
        tokenizer_decode=lambda ids: ("<answer>x</answer>"
                                      if sum(ids) % 2 == 0 else "wrong"),
        tag_token_ids={"<think>": [50], "<evidence>": [51], "<answer>": [52]},
        engine_kwargs=(dict(num_slots=4, max_len=128, prompt_buckets=(64,))
                       if with_vision else
                       dict(num_slots=4, max_len=64, prompt_buckets=(16,))),
        ref_params=jax.tree_util.tree_map(lambda x: x, params),
        critic=critic)
    rng = np.random.default_rng(4)
    if with_vision:
        mcfg = Qwen25VLConfig.tiny()
        prompts = [_vision_prompt(rng, mcfg, px=56),
                   _vision_prompt(rng, mcfg, px=42)]
    else:
        prompts = [dict(input_ids=rng.integers(0, 100, size=(6,))
                        .astype(np.int32),
                        ground_truth="<answer>x</answer>")
                   for _ in range(2)]
    before = [np.asarray(x).copy()
              for x in jax.tree_util.tree_leaves(critic.params["params"])]
    captured = {}
    orig = critic.compute_values

    def spy(batch):
        captured["batch"] = {k: v for k, v in batch.items()}
        return orig(batch)

    critic.compute_values = spy
    hist = trainer.fit([prompts])
    assert len(hist) == 1
    m = hist[0][1]
    assert np.isfinite(m["loss"]) and np.isfinite(m["critic/vf_loss"])
    assert "critic/kl" in m
    # GAE-only metric families (reference metrics.py:86-99 use_critic=True)
    for k in ("critic/values/mean", "critic/vf_explained_var",
              "timing_s/values", "timing_s/update_critic",
              "timing_per_token_ms/update_critic"):
        assert k in m and np.isfinite(m[k]), k
    after = [np.asarray(x)
             for x in jax.tree_util.tree_leaves(critic.params["params"])]
    assert any((a != b).any() for a, b in zip(before, after))
    if with_vision:
        b = captured["batch"]
        assert "vision_embeds" in b and "slot_map" in b
        v_seeing = orig(b)
        blind = {k: v for k, v in b.items()
                 if k not in ("vision_embeds", "slot_map")}
        v_blind = orig(blind)
        # the value model must actually SEE the images: a text-blind
        # critic returns different values on image prompts
        assert not np.allclose(v_seeing, v_blind, atol=1e-5)


def test_rl_validate_save_resume(tmp_path):
    """Validation metrics + gen-sample table + kill-and-resume mid-training
    (ray_trainer._validate :375-448, _save/_load_checkpoint :312-373)."""
    import dataclasses as dc
    from visrag_tpu.utils.tracker import Tracker

    t1 = _tiny_trainer()
    t1.cfg = dc.replace(
        t1.cfg,
        rollout=dc.replace(t1.cfg.rollout, n=2, max_response_length=8),
        trainer=dc.replace(t1.cfg.trainer, total_steps=1,
                           rollout_batch_size=2, save_freq=1, val_freq=1,
                           val_n=1, val_generations_to_log=2,
                           output_dir=str(tmp_path / "ckpts")))
    t1.engine_kwargs = dict(num_slots=4, max_len=64, prompt_buckets=(16,))
    t1.decode = lambda ids: ("<answer>x</answer>" if sum(ids) % 2 == 0
                             else "wrong")
    rng = np.random.default_rng(4)
    prompts = [dict(input_ids=rng.integers(0, 100, size=(6,)).astype(np.int32),
                    ground_truth="<answer>x</answer>") for _ in range(2)]
    tracker = Tracker(str(tmp_path / "logs"))
    from visrag_tpu.data.datasets import StatefulIterator
    it1 = StatefulIterator(lambda: iter([prompts]), cycle=True)
    t1.data_iter = it1
    hist = t1.fit(it1, val_prompts=prompts, tracker=tracker)
    tracker.close()
    m = hist[0][1]
    assert "val/reward_score" in m and np.isfinite(m["val/reward_score"])
    gen_log = (tmp_path / "logs" / "generations_1.jsonl")
    assert gen_log.exists() and len(gen_log.read_text().strip().split("\n")) >= 1

    # fresh trainer with DIFFERENT params resumes to t1's state
    t2 = _tiny_trainer()
    t2.cfg = dc.replace(t2.cfg, trainer=dc.replace(
        t2.cfg.trainer, output_dir=str(tmp_path / "ckpts")))
    t2.params = {"params": jax.tree_util.tree_map(
        lambda x: x * 0, t2.params["params"])}
    it2 = StatefulIterator(lambda: iter([prompts]), cycle=True)
    t2.data_iter = it2
    assert t2.maybe_resume()
    assert t2.step == 1 and t2._uid_next == t1._uid_next
    # data cursor + fit rng round-trip (VERDICT next-round #7)
    assert it2.state() == it1.state()
    assert t2._rng is not None
    np.testing.assert_array_equal(
        np.asarray(jax.random.key_data(t2._rng)),
        np.asarray(jax.random.key_data(t1._rng)))
    for a, b in zip(jax.tree_util.tree_leaves(t1.params["params"]),
                    jax.tree_util.tree_leaves(t2.params["params"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def _vision_prompt(rng, cfg, px=56):
    """Tiny Qwen-VL prompt: one small image + text, with mrope positions and
    a flat slot map (the evisrag_predict flow at test scale)."""
    from PIL import Image
    from visrag_tpu.models.mrope import get_rope_index
    from visrag_tpu.preprocess.qwen_vision import prepare_vision_batch

    img = Image.fromarray(rng.integers(0, 255, (px, px, 3), dtype=np.uint8))
    vb = prepare_vision_batch([img], head_dim=cfg.vision.head_dim,
                              patch_size=cfg.vision.patch_size,
                              min_pixels=16 * 16, max_pixels=px * px)
    n_img = vb.n_tokens
    ids = np.concatenate([
        rng.integers(0, 100, size=(3,)),
        np.full((n_img,), cfg.image_token_id),
        rng.integers(0, 100, size=(4,)),
    ]).astype(np.int32)
    pos = get_rope_index(ids, vb.grid_thw, cfg.image_token_id)
    slot = np.full(ids.shape, -1, np.int32)
    slot[ids == cfg.image_token_id] = np.arange(n_img)
    vision_batch = {k: getattr(vb, k) for k in
                    ("patches", "rot_cos", "rot_sin", "seg_window",
                     "seg_full", "reverse_index")}
    return dict(input_ids=ids, positions=pos, vision_batch=vision_batch,
                slot_map=slot, ground_truth="<answer>x</answer>")


@pytest.mark.parametrize("offload", [False, True])
def test_rl_fit_with_vision(offload):
    """Vision prompts flow end-to-end: engine rollout with images, ONE
    combined frozen-tower embedding table for the update, packed path with
    packed slot maps, masked optimizer leaves the vision tower untouched.

    offload=True exercises actor.offload_frozen_params: the tower's leaves
    live on HOST through the logp/update phases (frozen_arg={} in the grad
    jits — the forward consumes vision_embeds, never the tower) and come
    back to device at the next rollout; two steps prove the round trip."""
    import dataclasses as dc

    from test_qwen25_vl import _hf_tiny
    from visrag_tpu.config import RLConfig
    from visrag_tpu.models.hf_loader import convert_qwen25_vl
    from visrag_tpu.models.qwen25_vl import Qwen25VL, Qwen25VLConfig
    from visrag_tpu.rl.trainer import RLTrainer

    ref, _ = _hf_tiny()
    params = {"params": convert_qwen25_vl(
        {k: v for k, v in ref.state_dict().items()})}
    model = Qwen25VL(Qwen25VLConfig.tiny())
    mcfg = Qwen25VLConfig.tiny()

    steps = 2 if offload else 1
    cfg = RLConfig()
    cfg = dc.replace(
        cfg,
        rollout=dc.replace(cfg.rollout, n=2, max_response_length=6),
        trainer=dc.replace(cfg.trainer, total_steps=steps,
                           rollout_batch_size=2),
        actor=dc.replace(cfg.actor, offload_frozen_params=offload))
    trainer = RLTrainer(
        model, params, cfg,
        tokenizer_decode=lambda ids: ("<answer>x</answer>"
                                      if sum(ids) % 2 == 0 else "wrong"),
        tag_token_ids={"<think>": [50], "<evidence>": [51], "<answer>": [52]},
        engine_kwargs=dict(num_slots=4, max_len=128, prompt_buckets=(64,)))
    rng = np.random.default_rng(4)
    prompts = [_vision_prompt(rng, mcfg, px=56),
               _vision_prompt(rng, mcfg, px=42)]
    vis_before = [np.asarray(x).copy() for x in jax.tree_util.tree_leaves(
        trainer.params["params"]["visual"])]
    lm_before = [np.asarray(x).copy() for x in jax.tree_util.tree_leaves(
        trainer.params["params"]["model"])]
    hist = trainer.fit(iter([prompts] * steps))
    assert len(hist) == steps and np.isfinite(hist[0][1]["loss"])
    if offload:
        # after the step's update the tower leaves are host arrays
        assert all(not isinstance(x, jax.Array)
                   for x in jax.tree_util.tree_leaves(
                       trainer.params["params"]["visual"]))
    vis_after = [np.asarray(x) for x in jax.tree_util.tree_leaves(
        trainer.params["params"]["visual"])]
    lm_after = [np.asarray(x) for x in jax.tree_util.tree_leaves(
        trainer.params["params"]["model"])]
    # frozen tower: bit-identical; LM: updated
    for a, b in zip(vis_before, vis_after):
        np.testing.assert_array_equal(a, b)
    if hist[0][1]["grad_norm"] > 0:
        assert any((a != b).any() for a, b in zip(lm_before, lm_after))


def test_rl_vision_logp_matches_ingraph():
    """Precomputed-embeds logp == in-graph vision_batch forward (the two
    paths the update can take)."""
    from test_qwen25_vl import _hf_tiny
    from visrag_tpu.models.hf_loader import convert_qwen25_vl
    from visrag_tpu.models.qwen25_vl import Qwen25VL, Qwen25VLConfig
    from visrag_tpu.preprocess.qwen_vision import combine_vision_batches

    ref, _ = _hf_tiny()
    params = {"params": convert_qwen25_vl(
        {k: v for k, v in ref.state_dict().items()})}
    model = Qwen25VL(Qwen25VLConfig.tiny())
    mcfg = Qwen25VLConfig.tiny()
    rng = np.random.default_rng(7)
    p1 = _vision_prompt(rng, mcfg, px=56)
    p2 = _vision_prompt(rng, mcfg, px=42)
    table, offs = combine_vision_batches([p1["vision_batch"],
                                          p2["vision_batch"]])
    S = max(len(p1["input_ids"]), len(p2["input_ids"]))
    ids = np.zeros((2, S), np.int32)
    slot = np.full((2, S), -1, np.int32)
    mask = np.zeros((2, S), np.int32)
    pos = np.zeros((3, 2, S), np.int32)
    for i, p in enumerate((p1, p2)):
        L = len(p["input_ids"])
        ids[i, :L] = p["input_ids"]
        mask[i, :L] = 1
        slot[i, :L] = np.where(p["slot_map"] >= 0,
                               p["slot_map"] + offs[i], -1)
        pos[:, i, :L] = p["positions"]

    embeds = model.apply(params, {k: jnp.asarray(v)
                                  for k, v in table.items()},
                         method=model.encode_images)
    lg_pre, _ = model.apply(params, jnp.asarray(ids),
                            attention_mask=jnp.asarray(mask),
                            positions=jnp.asarray(pos),
                            vision_embeds=embeds,
                            slot_map=jnp.asarray(slot))
    # in-graph single-prompt forward equals the combined-table rows
    L1 = len(p1["input_ids"])
    lg_ref, _ = model.apply(
        params, jnp.asarray(p1["input_ids"][None]),
        positions=jnp.asarray(p1["positions"][:, None]),
        vision_batch={k: jnp.asarray(v)
                      for k, v in p1["vision_batch"].items()},
        slot_map=jnp.asarray(p1["slot_map"][None]))
    np.testing.assert_allclose(np.asarray(lg_pre)[0, :L1],
                               np.asarray(lg_ref)[0], rtol=2e-4, atol=2e-4)


def test_rl_hybrid_tp_rollout():
    """The hybrid engine (VERDICT round-2 missing #1): RLTrainer on a
    (data=4, model=2) mesh runs its rollout TENSOR-PARALLEL while the
    update stays FSDP over data. Checks: the engine is tp=2 and actually
    prefilled; rollout tokens are identical to the FSDP(data=8) trainer's;
    the post-update weight handoff re-applies the TP shardings (a plain
    `engine.params = ...` would silently drop them); two steps match the
    data=8 run's params."""
    import dataclasses as dc

    from test_qwen25_vl import _hf_tiny
    from visrag_tpu.config import MeshConfig, RLConfig
    from visrag_tpu.mesh import build_mesh
    from visrag_tpu.models.hf_loader import convert_qwen25_vl
    from visrag_tpu.models.qwen25_vl import Qwen25VL, Qwen25VLConfig
    from visrag_tpu.rl.trainer import RLTrainer

    ref, _ = _hf_tiny()
    base = {k: v for k, v in ref.state_dict().items()}
    model = Qwen25VL(Qwen25VLConfig.tiny())
    cfg = RLConfig()
    cfg = dc.replace(
        cfg,
        rollout=dc.replace(cfg.rollout, n=2, max_response_length=8,
                           temperature=0.0),   # greedy: token-comparable
        actor=dc.replace(cfg.actor, lr=1e-3),
        trainer=dc.replace(cfg.trainer, total_steps=2,
                           rollout_batch_size=4))

    def decode(ids):
        return "<answer>x</answer>" if sum(ids) % 2 == 0 else "wrong"

    def build(mesh_cfg):
        params = {"params": convert_qwen25_vl(base)}
        return RLTrainer(
            model, params, cfg, tokenizer_decode=decode,
            tag_token_ids={"<think>": [50], "<evidence>": [51],
                           "<answer>": [52]},
            engine_kwargs=dict(num_slots=4, max_len=64, prompt_buckets=(16,)),
            mesh=build_mesh(mesh_cfg))

    rng = np.random.default_rng(3)
    prompts = [dict(input_ids=rng.integers(1, 90, size=(6,)).astype(np.int32),
                    ground_truth="<answer>x</answer>") for _ in range(4)]

    t_tp = build(MeshConfig(data=4, model=2))
    t_dp = build(MeshConfig(data=8))
    # step-1 rollouts token-identical between tp=2 and tp=1 engines
    rb_tp = t_tp.rollout([dict(p) for p in prompts], jax.random.PRNGKey(5))
    rb_dp = t_dp.rollout([dict(p) for p in prompts], jax.random.PRNGKey(5))
    assert rb_tp.responses == rb_dp.responses
    assert t_tp._engine.tp == 2 and t_dp._engine.tp == 1
    assert t_tp._engine.prefill_count == 4    # one per prompt group

    def tp_sharded(engine):
        return any("model" in str(getattr(l.sharding, "spec", ""))
                   for l in jax.tree_util.tree_leaves(engine.params)
                   if hasattr(l, "sharding"))

    assert tp_sharded(t_tp._engine) and not tp_sharded(t_dp._engine)

    h_tp = t_tp.fit(iter([prompts, prompts]))
    h_dp = t_dp.fit(iter([prompts, prompts]))
    assert len(h_tp) == 2 and len(h_dp) == 2
    # the handoff after the update must have RE-APPLIED the TP shardings
    assert tp_sharded(t_tp._engine)
    for a, b in zip(jax.tree_util.tree_leaves(t_tp.params["params"]),
                    jax.tree_util.tree_leaves(t_dp.params["params"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


def _estimator_trainer(cfg_extra=None, **trainer_kw):
    from test_qwen25_vl import _hf_tiny
    from visrag_tpu.models.hf_loader import convert_qwen25_vl
    from visrag_tpu.models.qwen25_vl import Qwen25VL, Qwen25VLConfig
    from visrag_tpu.rl.trainer import RLTrainer
    import dataclasses

    ref, _ = _hf_tiny()
    params = {"params": convert_qwen25_vl(
        {k: v for k, v in ref.state_dict().items()})}
    model = Qwen25VL(Qwen25VLConfig.tiny())
    cfg = dataclass_replace(__import__(
        "visrag_tpu.config", fromlist=["RLConfig"]).RLConfig())
    if cfg_extra:
        cfg = dataclasses.replace(
            cfg, algorithm=dataclasses.replace(cfg.algorithm, **cfg_extra))
    trainer = RLTrainer(
        model, params, cfg,
        tokenizer_decode=lambda ids: ("<answer>x</answer>"
                                      if sum(ids) % 2 == 0 else "wrong"),
        tag_token_ids={"<think>": [50], "<evidence>": [51], "<answer>": [52]},
        engine_kwargs=dict(num_slots=4, max_len=64, prompt_buckets=(16,)),
        **trainer_kw)
    return trainer


@pytest.mark.parametrize("estimator", ["grpo", "rloo", "reinforce_plus_plus",
                                       "remax"])
def test_rl_fit_token_level_estimators(estimator):
    """grpo/rloo/reinforce_plus_plus/remax run end-to-end through fit();
    advantages land in the (bs, 1, S) per-token layout the policy loss
    expects. remax wires the greedy baseline rollout (VERDICT round-3
    missing #2): one extra n=1/temperature=0 rollout per prompt batch."""
    trainer = _estimator_trainer({"adv_estimator": estimator})
    rng = np.random.default_rng(4)
    prompts = [dict(input_ids=rng.integers(0, 100, size=(6,))
                    .astype(np.int32),
                    ground_truth="<answer>x</answer>") for _ in range(2)]
    hist = trainer.fit([prompts])
    assert len(hist) == 1
    _, m = hist[0]
    assert np.isfinite(m["loss"]) and np.isfinite(m["grad_norm"])
    if estimator == "remax":
        # 2 prompt groups + 2 greedy baseline prefills
        assert trainer._engine.prefill_count == 4


def test_rl_remax_baseline_values():
    """ReMax advantages equal (sampled score − greedy baseline) broadcast
    over response tokens (core_algos.py:323-349): inject known rewards via
    the decode hook and check the assembled batch."""
    trainer = _estimator_trainer({"adv_estimator": "remax"})
    rng = np.random.default_rng(4)
    prompts = [dict(input_ids=rng.integers(0, 100, size=(6,))
                    .astype(np.int32),
                    ground_truth="<answer>x</answer>") for _ in range(2)]
    batch = trainer.make_batch(iter([prompts]), jax.random.PRNGKey(0))
    assert "reward_baselines" in batch
    assert batch["reward_baselines"].shape == (batch["input_ids"].shape[0],)
    trainer.ref_params = None
    m = trainer._prepare_token_adv(batch)
    adv = batch["advantages"]          # (bs, 1, S)
    scores = batch["reward_tensor"].sum(-1)
    want = scores - batch["reward_baselines"]
    for i in range(len(want)):
        row = adv[i, 0][batch["response_mask"][i].astype(bool)]
        assert np.allclose(row, want[i]), (row, want[i])


def test_rl_nonfinite_grad_skips_optimizer_state():
    """A skipped (NaN-grad) step must leave params AND optimizer state
    untouched — advancing count/mu/nu on a skip shifts bias correction and
    consumes the Kahan compensation against an update never applied."""
    trainer = _estimator_trainer()
    train, _ = trainer._split_params(trainer.params["params"])
    p0 = [np.asarray(x).copy() for x in jax.tree_util.tree_leaves(train)]
    o0 = [np.asarray(x).copy() for x in
          jax.tree_util.tree_leaves(trainer.opt_state)]
    bad = jax.tree_util.tree_map(
        lambda p: jnp.full(p.shape, jnp.nan, p.dtype), train)
    newp, newo, m = trainer._apply_jit(train, trainer.opt_state, bad)
    assert m["grad_skipped"] == 1.0
    for a, b in zip(p0, jax.tree_util.tree_leaves(newp)):
        np.testing.assert_array_equal(a, np.asarray(b))
    for a, b in zip(o0, jax.tree_util.tree_leaves(newo)):
        np.testing.assert_array_equal(a, np.asarray(b))


def test_rl_rollout_bans_image_token():
    """RLTrainer(banned_token_ids=...) suppresses the ids in every rollout
    sample (the reference's image-token logit bias,
    vllm_rollout_spmd.py:42-49,132) — without the ban the same ids DO
    appear, so the ban is load-bearing."""
    rng = np.random.default_rng(9)
    prompts = [dict(input_ids=rng.integers(1, 90, size=(6,)).astype(np.int32),
                    ground_truth="<answer>x</answer>") for _ in range(2)]
    base = _estimator_trainer({"adv_estimator": "grpo"})
    rb = base.rollout([dict(p) for p in prompts], jax.random.PRNGKey(3))
    seen = sorted({t for o in rb.responses for t in o})[:4]
    assert seen
    banned = _estimator_trainer({"adv_estimator": "grpo"},
                                banned_token_ids=seen)
    rb2 = banned.rollout([dict(p) for p in prompts], jax.random.PRNGKey(3))
    for o in rb2.responses:
        assert not set(o) & set(seen), (o, seen)


def test_rl_optimizer_warmup_scales_first_steps():
    """actor.lr_warmup_steps wraps the optimizer in constant-with-warmup
    (reference fsdp_workers.py:309-316): the first optimizer step runs at
    lr·0/warmup = 0, so params stay EXACTLY put, while the no-warmup
    trainer moves (VERDICT round-3 missing #4)."""
    rng = np.random.default_rng(13)
    batch = _synth_train_batch(rng)
    t0 = _tiny_trainer()
    tw = _tiny_trainer(lr_warmup_steps=1000)
    before = [np.asarray(x).copy()
              for x in jax.tree_util.tree_leaves(tw.params["params"])]
    for t in (t0, tw):
        b = dict(batch)
        b["old_log_probs"] = t.compute_log_probs(t.params, b)
        t.update_policy(b)
    after_w = [np.asarray(x)
               for x in jax.tree_util.tree_leaves(tw.params["params"])]
    after_0 = [np.asarray(x)
               for x in jax.tree_util.tree_leaves(t0.params["params"])]
    assert all((a == b).all() for a, b in zip(before, after_w))
    assert any((a != b).any() for a, b in zip(before, after_0))


def test_rl_optimizer_warmup_ratio_and_betas_consumed():
    """lr_warmup_ratio resolves against trainer.total_steps; betas feed
    AdamW (honesty plumbing for the reference's OptimConfig surface)."""
    from visrag_tpu.training.optim import (constant_schedule_with_warmup,
                                           resolve_warmup_steps)
    assert resolve_warmup_steps(None, 0.05, 200) == 10
    assert resolve_warmup_steps(7, 0.05, 200) == 7
    sched = constant_schedule_with_warmup(1e-3, 4)
    assert float(sched(jnp.asarray(0))) == 0.0
    assert float(sched(jnp.asarray(2))) == pytest.approx(5e-4)
    assert float(sched(jnp.asarray(100))) == pytest.approx(1e-3)
    assert constant_schedule_with_warmup(1e-3, 0) == 1e-3


def test_rl_fit_metric_families():
    """fit() emits the reference's per-step metric families with matching
    key names (trainer/metrics.py:27-123; VERDICT round-3 missing #5):
    critic/* stats, length stats + clip ratios, timing_s/* +
    timing_per_token_ms/* per phase, perf/throughput."""
    trainer = _estimator_trainer({"adv_estimator": "grpo"})
    rng = np.random.default_rng(4)
    prompts = [dict(input_ids=rng.integers(0, 100, size=(6,))
                    .astype(np.int32),
                    ground_truth="<answer>x</answer>") for _ in range(2)]
    hist = trainer.fit([prompts])
    m = hist[0][1]
    want = [
        "critic/score/mean", "critic/score/max", "critic/score/min",
        "critic/rewards/mean", "critic/rewards/max", "critic/rewards/min",
        "critic/advantages/mean", "critic/advantages/max",
        "critic/advantages/min",
        "critic/returns/mean", "critic/returns/max", "critic/returns/min",
        "response_length/mean", "response_length/max",
        "response_length/min", "response_length/clip_ratio",
        "prompt_length/mean", "prompt_length/max", "prompt_length/min",
        "prompt_length/clip_ratio",
        "timing_s/gen", "timing_s/reward", "timing_s/host_assemble",
        "timing_s/old", "timing_s/adv", "timing_s/update_actor",
        "timing_s/step",
        "timing_per_token_ms/gen", "timing_per_token_ms/reward",
        "timing_per_token_ms/old", "timing_per_token_ms/adv",
        "timing_per_token_ms/update_actor",
        "perf/total_num_tokens", "perf/time_per_step", "perf/throughput",
    ]
    missing = [k for k in want if k not in m]
    assert not missing, missing
    assert all(np.isfinite(m[k]) for k in want), \
        {k: m[k] for k in want if not np.isfinite(m[k])}
    assert m["perf/throughput"] > 0
    # no EOS in the tiny model: every response runs to max_response_length,
    # so the clip ratio must read exactly 1 (and prompts never clip)
    assert m["response_length/clip_ratio"] == 1.0
    assert m["prompt_length/clip_ratio"] == 0.0


def test_rl_rollout_prefix_cache_cleared_on_update():
    """RL rollouts with the prefix cache on (driver default for long
    prompts): shared-prefix prompts reuse cached KV blocks within a step,
    greedy outputs are identical to the uncached engine, and
    Engine.set_params (the per-step weight handoff) clears the cache so
    post-update rollouts can never serve stale-weight KV (VERDICT round-3
    next #8)."""
    rng = np.random.default_rng(21)
    prefix = rng.integers(1, 90, size=(40,)).astype(np.int32)
    prompts = [dict(input_ids=np.concatenate(
                        [prefix, rng.integers(1, 90, size=(8,))
                         .astype(np.int32)]),
                    ground_truth="<answer>x</answer>") for _ in range(3)]
    kw = dict(num_slots=4, max_len=128, prompt_buckets=(16, 64),
              chunked_prefill_tokens=16)
    t_plain = _estimator_trainer({"adv_estimator": "grpo"})
    t_plain.engine_kwargs = dict(kw)
    t_cache = _estimator_trainer({"adv_estimator": "grpo"})
    t_cache.engine_kwargs = dict(kw, prefix_cache=True)
    import dataclasses as dc
    for t in (t_plain, t_cache):
        t.cfg = dc.replace(t.cfg, rollout=dc.replace(
            t.cfg.rollout, n=2, temperature=0.0, max_response_length=8))
    rb_p = t_plain.rollout([dict(p) for p in prompts], jax.random.PRNGKey(5))
    rb_c = t_cache.rollout([dict(p) for p in prompts], jax.random.PRNGKey(5))
    assert rb_c.responses == rb_p.responses
    eng = t_cache._engine
    assert eng.prefix_hits > 0          # the shared prefix was reused
    # rollout() sleeps the engine (KV HBM to the trainer) — that already
    # cleared the cache
    assert not eng._prefix_cache
    # re-populate directly, then verify the weight handoff clears it too
    # (set_params: stale-weight KV must not survive an update)
    eng.wake()
    from visrag_tpu.serving.sampling import SamplingParams
    eng.generate([dict(input_ids=prompts[0]["input_ids"])],
                 sampling=SamplingParams(temperature=0.0, max_tokens=2),
                 rng=jax.random.PRNGKey(0))
    assert len(eng._prefix_cache) > 0
    eng.set_params(t_cache.params)
    assert len(eng._prefix_cache) == 0


def test_rl_ref_offload_parity():
    """offload_ref_params keeps the reference policy on HOST outside its
    once-per-step logp phase (the reference ref worker's param_offload,
    fsdp_workers.py ref_policy cpu_offload) and must not change the math:
    ref_log_probs match the resident-ref run exactly. Also checks the ref
    tower strip: a full ref checkpoint (incl. `visual`) loses its frozen
    tower copy at init — ref logp consumes the actor-tower vision_embeds
    table, never the ref's own tower."""
    import dataclasses as dc

    from test_qwen25_vl import _hf_tiny
    from visrag_tpu.config import RLConfig
    from visrag_tpu.models.hf_loader import convert_qwen25_vl
    from visrag_tpu.models.qwen25_vl import Qwen25VL, Qwen25VLConfig
    from visrag_tpu.rl.trainer import RLTrainer

    hf, _ = _hf_tiny()
    params = {"params": convert_qwen25_vl(
        {k: v for k, v in hf.state_dict().items()})}
    mcfg = Qwen25VLConfig.tiny()

    captured = {}

    def build(offload_ref):
        cfg = RLConfig()
        cfg = dc.replace(
            cfg,
            rollout=dc.replace(cfg.rollout, n=2, max_response_length=6,
                               temperature=0.0),
            algorithm=dc.replace(cfg.algorithm, adv_estimator="grpo",
                                 use_kl_loss=True),
            actor=dc.replace(cfg.actor, kl_coef=0.1,
                             offload_ref_params=offload_ref),
            trainer=dc.replace(cfg.trainer, total_steps=1,
                               rollout_batch_size=2))
        t = RLTrainer(
            Qwen25VL(mcfg), jax.tree_util.tree_map(jnp.asarray, params), cfg,
            tokenizer_decode=lambda ids: ("<answer>x</answer>"
                                          if sum(ids) % 2 == 0 else "wrong"),
            tag_token_ids={"<think>": [50], "<evidence>": [51],
                           "<answer>": [52]},
            engine_kwargs=dict(num_slots=4, max_len=128, prompt_buckets=(64,)),
            ref_params=jax.tree_util.tree_map(jnp.asarray, params))
        orig = t.update_policy

        def spy(batch):
            captured[offload_ref] = np.asarray(batch["ref_log_probs"]).copy()
            return orig(batch)
        t.update_policy = spy
        return t

    rng = np.random.default_rng(4)
    prompts = [_vision_prompt(rng, mcfg, px=56),
               _vision_prompt(rng, mcfg, px=42)]

    for offload_ref in (False, True):
        t = build(offload_ref)
        # the ref tower copy is stripped for BOTH (frozen tower ≡ actor's)
        assert "visual" not in t.ref_params["params"]
        if offload_ref:
            # host-resident between phases: plain numpy leaves after init
            assert all(not isinstance(x, jax.Array)
                       for x in jax.tree_util.tree_leaves(t.ref_params))
        hist = t.fit([[dict(p) for p in prompts]])
        assert len(hist) == 1 and np.isfinite(hist[0][1]["loss"])
        if offload_ref:
            # still host-resident after the step
            assert all(not isinstance(x, jax.Array)
                       for x in jax.tree_util.tree_leaves(t.ref_params))

    assert captured[False].shape == captured[True].shape
    np.testing.assert_array_equal(captured[False], captured[True])
