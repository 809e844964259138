"""Generation layer: prompts, QA metrics parity, strategies."""

import numpy as np
import pytest
from PIL import Image

from visrag_tpu.generation.prompts import build_prompt
from visrag_tpu.generation.qa_eval import (INSUFFICIENT_GOLD, check_answer,
                                           evaluate_qa, extract_answer_tag,
                                           normalize_answer_qa, qa_metrics,
                                           within_5_percent)
from visrag_tpu.generation.strategies import (concat_pages, horizontal_concat,
                                              vertical_concat,
                                              weighted_selection)


def test_prompts_match_reference():
    """Prompt builders must be byte-identical to the reference protocol."""
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "ref_prompt", "/root/reference/src/evisrag/prompt.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    q = "what is the trend in 2020?"
    assert build_prompt("evidence_prompt_grpo", q) == mod.evidence_promot_grpo(q)
    assert build_prompt("evidence_prompt_notrain", q) == mod.evidence_promot_oneshot(q)
    assert build_prompt("cocot", q) == mod.COCOT(q)
    assert build_prompt("ccot", q) == mod.CCOT(q)
    assert build_prompt("ddcot", q) == mod.DDCOT(q)


def test_qa_metrics_vs_reference():
    """Metric math vs AST-extracted reference evaluate_predictions."""
    from ref_oracle import load_functions
    import re, string
    from collections import Counter
    fns = load_functions("src/evisrag/eval.py",
                         ["normalize_answer_qa", "evaluate_predictions"],
                         extra_ns={"re": re, "string": string,
                                   "Counter": Counter})
    cases = [
        ("The answer is 3%", ["3%"]),
        ("3 %", ["3%"]),
        ("insufficient to answer", INSUFFICIENT_GOLD),
        ("no relevant information", ["no relevant information"]),
        ("blue and red", ["red"]),
        ("totally wrong", ["42"]),
    ]
    for pred, gold in cases:
        assert normalize_answer_qa(pred) == fns["normalize_answer_qa"](pred)
        want, _ = fns["evaluate_predictions"](pred, gold)
        got = qa_metrics(pred, gold)
        for k in ("em", "acc", "f1"):
            assert got[k] == pytest.approx(want[k]), (pred, gold, k)


def test_evaluate_qa_aggregate():
    preds = ["<answer>42</answer>", "<answer>insufficient to answer</answer>"]
    golds = [["42"], INSUFFICIENT_GOLD]
    out = evaluate_qa(preds, golds, [True, False])
    assert out["global_em"] == 1.0
    assert out["cnt_issuff"] == 1 and out["cnt_unsuff"] == 1
    assert out["unsuff_em"] == 1.0


def test_answer_tag_extraction():
    assert extract_answer_tag("<think>x</think><answer> 7 </answer>") == " 7 "
    assert extract_answer_tag("raw") == "raw"


def test_numeric_tolerance():
    assert within_5_percent("104", "100")
    assert not within_5_percent("106", "100")
    assert check_answer("104", "100")
    assert check_answer("The value is blue.", "blue")
    assert not check_answer("red", "blue")


def test_concat_shapes():
    a = Image.new("RGB", (100, 200), (255, 0, 0))
    b = Image.new("RGB", (50, 100), (0, 255, 0))
    h = horizontal_concat([a, b])
    assert h.height == 200 and h.width == 100 + 100  # b upscaled 2x
    v = vertical_concat([a, b])
    assert v.width == 100 and v.height == 200 + 200
    assert concat_pages([a, b]).height in (200, 400)


def test_weighted_selection():
    answers = ["a", "b", "c"]
    # page 1 has the best doc score but poor seq prob; page 2 wins overall
    best, idx = weighted_selection(answers, [-5.0, -0.1, -4.0],
                                   [2.0, 1.5, 0.1])
    assert idx == 1 and best == "b"
