"""Pluggable reward functions (reference verl/workers/reward/function.py
:47-105 + reward/config.py post_init): importlib loading with loud errors,
sequential vs batch managers, custom channel/span declarations, and an e2e
fit() with a reward loaded from a user file."""

import dataclasses as dc

import jax
import numpy as np
import pytest

from visrag_tpu.config import RewardConfig, RLConfig
from visrag_tpu.rl.reward_manager import RewardManager, load_reward_function
from visrag_tpu.rl.rewards import REWARD_CHANNELS, compute_rewards


def test_load_missing_file_raises():
    with pytest.raises(FileNotFoundError, match="not found"):
        load_reward_function("/nonexistent/reward.py")


def test_load_missing_attr_raises(tmp_path):
    p = tmp_path / "r.py"
    p.write_text("def other(x):\n    return x\n")
    with pytest.raises(AttributeError, match="does not have function"):
        load_reward_function(str(p), "main")


def test_load_exec_failure_raises(tmp_path):
    p = tmp_path / "r.py"
    p.write_text("raise ImportError('boom')\n")
    with pytest.raises(RuntimeError, match="Failed to load"):
        load_reward_function(str(p))


def test_load_colon_suffix_and_kwargs(tmp_path):
    p = tmp_path / "r.py"
    p.write_text("def score(inp, scale=1.0):\n"
                 "    return {'overall': scale * inp['response_length']}\n")
    fn, _mod = load_reward_function(str(p) + ":score", None,
                                    {"scale": 2.0})
    assert fn({"response_length": 3})["overall"] == 6.0
    # explicit name wins over the suffix
    fn2, _ = load_reward_function(str(p) + ":nope", "score")
    assert fn2({"response_length": 1})["overall"] == 1.0


def test_default_manager_is_evidencecot():
    m = RewardManager(RewardConfig(), max_response_length=64)
    assert m.channels == REWARD_CHANNELS
    assert m.required_tags == {"<think>", "<evidence>", "<answer>"}
    resp = ["<observe>a</observe><evidence>[1]: x</evidence>"
            "<think>t</think><answer>x</answer>"]
    gt = ["<answer>x</answer>"]
    got, _ = m.compute(resp, gt, [10])
    want, _ = compute_rewards(resp, gt, [10], max_response_length=64)
    np.testing.assert_array_equal(got, want)


def test_sequential_manager(tmp_path):
    p = tmp_path / "r.py"
    p.write_text(
        "def main(inp, bonus=0.0):\n"
        "    ok = inp['ground_truth'] in inp['response']\n"
        "    return {'overall': float(ok) + bonus, 'match': float(ok)}\n")
    m = RewardManager(RewardConfig(reward_type="sequential",
                                   reward_function=str(p),
                                   reward_function_kwargs={"bonus": 0.5}))
    assert m.channels == ("overall",)
    assert m.required_tags == set()
    tensor, metrics = m.compute(["hello x", "nope"], ["x", "x"], [2, 1])
    np.testing.assert_allclose(tensor, [[1.5], [0.5]])
    assert metrics["match"] == [1.0, 0.0]


def test_batch_manager_custom_channels(tmp_path):
    p = tmp_path / "r.py"
    p.write_text(
        "REWARD_CHANNELS = ('exact', 'length')\n"
        "CHANNEL_SPANS = {'exact': ('<a>', None), 'length': (None, None)}\n"
        "def main(inputs):\n"
        "    return [{'exact': float(i['ground_truth'] == i['response']),\n"
        "             'length': float(i['response_length'])}\n"
        "            for i in inputs]\n")
    m = RewardManager(RewardConfig(reward_type="batch",
                                   reward_function=str(p)))
    assert m.channels == ("exact", "length")
    assert m.required_tags == {"<a>"}
    tensor, _ = m.compute(["x", "y"], ["x", "x"], [1, 1])
    np.testing.assert_allclose(tensor, [[1.0, 1.0], [0.0, 1.0]])


def test_batch_manager_missing_span_raises(tmp_path):
    p = tmp_path / "r.py"
    p.write_text("REWARD_CHANNELS = ('a',)\nCHANNEL_SPANS = {}\n"
                 "def main(inputs):\n    return []\n")
    with pytest.raises(ValueError, match="CHANNEL_SPANS"):
        RewardManager(RewardConfig(reward_type="batch",
                                   reward_function=str(p)))


def test_batch_manager_wrong_count_raises(tmp_path):
    p = tmp_path / "r.py"
    p.write_text("def main(inputs):\n    return inputs[:1]\n")
    m = RewardManager(RewardConfig(reward_type="batch",
                                   reward_function=str(p)))
    with pytest.raises(ValueError, match="returned 1 scores"):
        m.compute(["a", "b"], ["a", "b"], [1, 1])


def test_missing_channel_key_raises(tmp_path):
    p = tmp_path / "r.py"
    p.write_text("def main(inp):\n    return {'not_overall': 1.0}\n")
    m = RewardManager(RewardConfig(reward_type="sequential",
                                   reward_function=str(p)))
    with pytest.raises(KeyError, match="missing channel"):
        m.compute(["a"], ["a"], [1])


def test_bad_reward_type_raises():
    with pytest.raises(ValueError, match="reward_type"):
        RewardManager(RewardConfig(reward_type="nope"))


def _fit_with_reward(reward_cfg, tag_ids):
    from test_qwen25_vl import _hf_tiny
    from visrag_tpu.models.hf_loader import convert_qwen25_vl
    from visrag_tpu.models.qwen25_vl import Qwen25VL, Qwen25VLConfig
    from visrag_tpu.rl.trainer import RLTrainer

    ref, _ = _hf_tiny()
    params = {"params": convert_qwen25_vl(
        {k: v for k, v in ref.state_dict().items()})}
    model = Qwen25VL(Qwen25VLConfig.tiny())
    cfg = RLConfig()
    cfg = dc.replace(
        cfg,
        rollout=dc.replace(cfg.rollout, n=4, max_response_length=8),
        trainer=dc.replace(cfg.trainer, total_steps=1, rollout_batch_size=2),
        reward=reward_cfg)
    rng = np.random.default_rng(4)
    prompts = [dict(input_ids=rng.integers(0, 100, size=(6,))
                    .astype(np.int32), ground_truth="x") for _ in range(2)]

    def decode(ids):
        return "x" if sum(ids) % 2 == 0 else "wrong"

    trainer = RLTrainer(
        model, params, cfg, tokenizer_decode=decode,
        tag_token_ids=tag_ids,
        engine_kwargs=dict(num_slots=4, max_len=64, prompt_buckets=(16,)))
    hist = trainer.fit([prompts])
    assert len(hist) == 1
    return trainer, hist[0][1]


def test_rl_fit_with_custom_sequential_reward(tmp_path):
    """e2e: one RS-GRPO step with a user reward file — the VERDICT round-4
    done-criterion for R11."""
    p = tmp_path / "myreward.py"
    p.write_text(
        "def main(inp):\n"
        "    return {'overall': float(inp['ground_truth'] in "
        "inp['response'])}\n")
    trainer, m = _fit_with_reward(
        RewardConfig(reward_type="sequential", reward_function=str(p)),
        tag_ids={})
    assert trainer.channels == ("overall",)
    assert np.isfinite(m["loss"]) and np.isfinite(m["grad_norm"])
    # the custom reward actually drove the batch: reward metric is the
    # group mean of a {0,1} containment score
    assert "critic/score/mean" in m


def test_rl_fit_with_custom_batch_reward(tmp_path):
    p = tmp_path / "myreward.py"
    p.write_text(
        "REWARD_CHANNELS = ('hit', 'len')\n"
        "CHANNEL_SPANS = {'hit': (None, None), 'len': (None, None)}\n"
        "def main(inputs):\n"
        "    return [{'hit': float(i['ground_truth'] in i['response']),\n"
        "             'len': -0.01 * i['response_length']}\n"
        "            for i in inputs]\n")
    trainer, m = _fit_with_reward(
        RewardConfig(reward_type="batch", reward_function=str(p)),
        tag_ids={})
    assert trainer.channels == ("hit", "len")
    assert np.isfinite(m["loss"])


def test_trainer_missing_tag_encoding_raises(tmp_path):
    p = tmp_path / "r.py"
    p.write_text(
        "REWARD_CHANNELS = ('a',)\n"
        "CHANNEL_SPANS = {'a': ('<mytag>', None)}\n"
        "def main(inputs):\n    return [{'a': 0.0} for _ in inputs]\n")
    with pytest.raises(ValueError, match="mytag"):
        _fit_with_reward(
            RewardConfig(reward_type="batch", reward_function=str(p)),
            tag_ids={})


def test_filter_key_not_a_channel_raises(tmp_path):
    p = tmp_path / "r.py"
    p.write_text("def main(inp):\n    return {'overall': 0.0}\n")
    from visrag_tpu.config import AlgorithmConfig
    cfg = RewardConfig(reward_type="sequential", reward_function=str(p))
    from test_qwen25_vl import _hf_tiny
    from visrag_tpu.models.hf_loader import convert_qwen25_vl
    from visrag_tpu.models.qwen25_vl import Qwen25VL, Qwen25VLConfig
    from visrag_tpu.rl.trainer import RLTrainer
    ref, _ = _hf_tiny()
    params = {"params": convert_qwen25_vl(
        {k: v for k, v in ref.state_dict().items()})}
    model = Qwen25VL(Qwen25VLConfig.tiny())
    rlc = RLConfig()
    rlc = dc.replace(
        rlc, reward=cfg,
        rollout=dc.replace(rlc.rollout, n=2, max_response_length=8),
        algorithm=dc.replace(rlc.algorithm, online_filtering=True,
                             filter_key="accuracy"),
        trainer=dc.replace(rlc.trainer, total_steps=1,
                           rollout_batch_size=2))
    trainer = RLTrainer(
        model, params, rlc, tokenizer_decode=lambda ids: "x",
        tag_token_ids={},
        engine_kwargs=dict(num_slots=4, max_len=64, prompt_buckets=(16,)))
    rng = np.random.default_rng(0)
    prompts = [dict(input_ids=rng.integers(0, 100, size=(6,))
                    .astype(np.int32), ground_truth="x")]
    with pytest.raises(ValueError, match="filter_key"):
        trainer.make_batch(iter([prompts]), jax.random.PRNGKey(0))
