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


def test_weighted_selection_strategy_batched_branch():
    """generate_with_strategy takes the score_fn.batched path when present
    (ONE call with every page) and returns the same winner as sequential."""
    from visrag_tpu.generation.strategies import generate_with_strategy
    pages = [Image.new("RGB", (8, 8), (c, 0, 0)) for c in (10, 20, 30)]
    scores = {10: -5.0, 20: -0.1, 30: -4.0}

    def score_fn(prompt, images):
        c = images[0].getpixel((0, 0))[0]
        return f"ans{c}", scores[c]

    seq = generate_with_strategy(
        "weighted_selection", "q", pages, [2.0, 1.5, 0.1],
        generate_fn=score_fn, prompt_builder=lambda q, n: q,
        score_fn=score_fn)

    calls = []

    def batched(items):
        calls.append(len(items))
        return [score_fn(p, imgs) for p, imgs in items]

    score_fn.batched = batched
    got = generate_with_strategy(
        "weighted_selection", "q", pages, [2.0, 1.5, 0.1],
        generate_fn=score_fn, prompt_builder=lambda q, n: q,
        score_fn=score_fn)
    assert calls == [3]          # one batched call covering all pages
    assert got == seq == "ans20"


# ---- VisRAG-Gen per-dataset eval protocol (generate.py parity) -------------


def _gen_oracle():
    import re as _re
    import string as _string
    from collections import Counter as _Counter
    from ref_oracle import load_functions
    gu = load_functions(
        "src/openmatch/generation_utils.py",
        ["preprocess_text", "is_numeric_data", "is_within_5_percent",
         "get_flatten_table"],
        extra_ns={"re": _re, "string": _string, "Counter": _Counter})
    import os as _os
    gen = load_functions(
        "visrag_scripts/generate/generate.py",
        ["check_responses", "get_input_text", "get_input_image"],
        extra_ns={"re": _re, "os": _os, **gu})
    return gu, gen


class _Args:
    def __init__(self, dataset):
        self.dataset_name = dataset


def test_preprocess_text_fuzz_vs_oracle():
    import random
    from visrag_tpu.generation.gen_eval import (preprocess_text,
                                                is_numeric_data,
                                                is_within_5_percent)
    gu, _ = _gen_oracle()
    rng = random.Random(0)
    frags = ["42", "42.5%", "1,234", "the cat", "a", "isnt", "dont", "Im",
             "o'clock", "zero", "ten", "A. option", "x-y", "p/q", "(note)",
             "7.5", "End.", "3.14", "what's", "TAB\tsep", "new\nline", ";x",
             "x ;", "50%", "yall", "none"]
    for _ in range(500):
        s = " ".join(rng.choices(frags, k=rng.randint(1, 8)))
        assert preprocess_text(s) == gu["preprocess_text"](s), s
    for v in ("42", "4.5", "x", "", "1e3", "nan"):
        assert is_numeric_data(v) == gu["is_numeric_data"](v)
    for a, b in ((100.0, 104.9), (100.0, 105.1), (2, 2), (-10, -10.4)):
        assert is_within_5_percent(a, b) == gu["is_within_5_percent"](a, b)


def test_flatten_table_matches_oracle(tmp_path):
    from visrag_tpu.generation.gen_eval import get_flatten_table
    gu, _ = _gen_oracle()
    import pandas as pd
    p = tmp_path / "t.csv"
    pd.DataFrame({"Year": [2019, 2020], "Sales": [1.5, 2.5],
                  "Region": ["EU", "US"]}).to_csv(p, index=False)
    ours = get_flatten_table(str(p))
    oracle = gu["get_flatten_table"]
    oracle.__globals__["pd"] = pd
    assert ours == oracle(str(p))
    assert ours.startswith("Table: Year | 2019 | 2020 & Sales")


def test_check_response_matches_oracle(capsys):
    from visrag_tpu.generation.gen_eval import check_response
    _, gen = _gen_oracle()
    cases = [
        ("ChartQA", "42%", "42"), ("ChartQA", "104", "100"),
        ("ChartQA", "106", "100"), ("ChartQA", "blue bar", "Blue Bar."),
        ("ChartQA", "0", "0"),
        ("ArxivQA", "b) because", "B"), ("ArxivQA", "c", "B"),
        ("PlotQA", "3.9", 4.0), ("PlotQA", "3.9", "4.0"),
        ("PlotQA", "four", "4"),
        ("MP-DocVQA", "Paris", ["paris", "PARIS city"]),
        ("MP-DocVQA", "nope", ["paris"]),
        ("InfoVQA", "12%", ["12"]),
        ("SlideVQA", "two", "2"), ("SlideVQA", "7", "seven"),
    ]
    for dataset, pred, answer in cases:
        ans_copy = list(answer) if isinstance(answer, list) else answer
        got = check_response(dataset, pred, ans_copy)[0]
        ans_copy2 = list(answer) if isinstance(answer, list) else answer
        want = gen["check_responses"](_Args(dataset), pred, ans_copy2, "q")[0]
        assert got == want, (dataset, pred, answer, got, want)


def test_gen_prompts_match_oracle():
    from visrag_tpu.generation.gen_eval import (build_image_prompt,
                                                build_text_prompt)
    _, gen = _gen_oracle()
    corpus = {"d1": "table one text", "d2": "table two text"}
    ex_opts = {"options": ["first", "second", "third"]}
    ex_pre = {"options": ["A. first", "B. second"]}
    for ds in ("PlotQA", "MP-DocVQA", "SlideVQA", "InfoVQA"):
        want = gen["get_input_text"](_Args(ds), "what?", corpus,
                                     ["d1", "d2"], {})
        got = build_text_prompt(ds, "what?", [corpus["d1"], corpus["d2"]], {})
        assert got == want, ds
        want_img = gen["get_input_image"](_Args(ds), "what?", {})
        assert build_image_prompt(ds, "what?", {}) == want_img[0]["content"]
    for ex in (ex_opts, ex_pre):
        want = gen["get_input_text"](_Args("ArxivQA"), "q?", corpus, ["d1"],
                                     {"options": list(ex["options"])})
        got = build_text_prompt("ArxivQA", "q?", [corpus["d1"]],
                                {"options": list(ex["options"])})
        assert got == want
        want_img = gen["get_input_image"](_Args("ArxivQA"), "q?",
                                          {"options": list(ex["options"])})
        got_img = build_image_prompt("ArxivQA", "q?",
                                     {"options": list(ex["options"])})
        assert got_img == want_img[0]["content"]


def test_oracle_docids_and_run_generate_eval():
    from visrag_tpu.driver.generate_eval import run_generate_eval
    from visrag_tpu.generation.gen_eval import oracle_docids
    assert oracle_docids("doc-12-3", "InfoVQA") == ["doc-12"]
    assert oracle_docids("d1tcy6d2query_number7", "SlideVQA") == ["d1", "d2"]

    from PIL import Image
    import numpy as np
    img = Image.fromarray(np.zeros((4, 4, 3), np.uint8))
    corpus = {"p1": img, "p2": img}
    run = {"q-1": {"p1": 0.9, "p2": 0.2}}
    examples = [dict(qid="q-1", query="color?", answer="blue")]

    def fake_gen(prompt, images):
        assert "Answer the question using a single word or phrase." in prompt
        return ("The Blue!", -0.5)

    acc, recs = run_generate_eval(
        "InfoVQA", examples, fake_gen, task_type="multi_image", topk=2,
        run=run, corpus=corpus)
    assert acc == 1.0 and recs[0]["correct"] == 1
