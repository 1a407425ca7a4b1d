"""Eval parser/metric tests, differential where the reference is importable."""

import json
import os
import random
import sys
import types

import numpy as np
import pytest

from open_o3_video_tpu.eval import mcq
from open_o3_video_tpu.eval import vstar
from open_o3_video_tpu.eval import judge as J
from open_o3_video_tpu.eval.dataloaders import videomme as VM

REF_DATALOADER = "/root/reference/eval/dataloader"


def _load_ref_videomme():
    if not os.path.isdir(REF_DATALOADER):
        return None
    if "loguru" not in sys.modules:
        import importlib.machinery

        loguru = types.ModuleType("loguru")
        loguru.__spec__ = importlib.machinery.ModuleSpec("loguru", None)

        class _L:
            def info(self, *a, **k):
                pass

        loguru.logger = _L()
        sys.modules["loguru"] = loguru
    sys.path.insert(0, REF_DATALOADER)
    try:
        import videomme as ref

        return ref
    except Exception:
        return None
    finally:
        sys.path.remove(REF_DATALOADER)


REF_VM = _load_ref_videomme()


class TestMCQParser:
    CASES = [
        "The answer is B.",
        "(C)",
        "A",
        "I think the best option is D: because reasons",
        "the blue car drives away",  # content match
        "",
        "A. or maybe B.",
        "first A then\nB\nfinally",
        "**C**",
        "{D}",
        "answer:\nB",
        "A B C D",
        "The answer is sunset over the hills",
    ]

    @pytest.mark.skipif(REF_VM is None, reason="reference not importable")
    @pytest.mark.parametrize("response", CASES)
    def test_differential(self, response):
        options = ["the blue car drives away", "a sunset over the hills", "two dogs", "an empty room"]
        index2ans, all_choices = mcq.get_multi_choice_info(options)
        ours = mcq.parse_multi_choice_response(response, all_choices, dict(index2ans))
        theirs = REF_VM.parse_multi_choice_response(response, list(all_choices), dict(index2ans))
        assert ours == theirs, response

    @pytest.mark.skipif(REF_VM is None, reason="reference not importable")
    def test_differential_random(self):
        options = ["alpha beta", "gamma delta", "epsilon", "zeta eta"]
        index2ans, all_choices = mcq.get_multi_choice_info(options)
        rng = random.Random(0)
        pieces = ["A", "B.", "(C)", "D:", "alpha beta", "zeta", "**A**", "{B}", "\n", " ", "word", ":", "C\n"]
        for _ in range(300):
            response = "".join(rng.choices(pieces, k=rng.randint(1, 8)))
            ours = mcq.parse_multi_choice_response(response, all_choices, dict(index2ans))
            theirs = REF_VM.parse_multi_choice_response(response, list(all_choices), dict(index2ans))
            assert ours == theirs, repr(response)


class TestVideoMMEAggregation:
    def _result(self, duration, cat, sub, task, pred, ans):
        return {"duration": duration, "category": cat, "sub_category": sub,
                "task_category": task, "pred_answer": pred, "answer": ans}

    def test_overall_accuracy(self):
        results = [
            self._result("short", "Knowledge", "Law", "OCR Problems", "A", "A"),
            self._result("long", "Knowledge", "Law", "OCR Problems", "B", "A"),
        ]
        logs = []
        score = VM.aggregate_results(results, log=logs.append)
        assert score == 50.0
        assert any("Overall Performance:  50.0%" in line for line in logs)

    def test_doc_to_text_think_prompt(self):
        doc = {"question": "What?", "options": ["A. x", "B. y", "C. z", "D. w"]}
        text = VM.doc_to_text(doc, think_mode=True)[0]
        assert text.startswith("Question:What?")
        assert "MUST NOT be longer than 100 words" in text
        plain = VM.doc_to_text(doc, think_mode=False)[0]
        assert plain.startswith("Select the best answer")


class TestJudgeAggregation:
    def _item(self, vqa_score_text="good answer", t1=None, s1=None):
        return {
            "question": "what?", "answer": "good answer", "answer_vqa": vqa_score_text,
            "frame_count": 300, "fps": 30.0, "width": 100, "height": 100,
            "domain": "TV", "timestamps": [2.0, 6.0],
            "answer_temporal": t1 if t1 is not None else [2.0, 6.0],
            "answer_temporal_pre": "", "answer_temporal_2": [0.0, 10.0],
            "answer_temporal_pre_2": "",
            "answer_spatial": s1 if s1 is not None else {"3": [10, 10, 50, 50]},
            "answer_spatial_2": None,
            "bboxes": [{"timestamp": 3, "xmin": 10, "ymin": 10, "xmax": 50, "ymax": 50}],
        }

    def test_chain_metrics(self, tmp_path):
        # Two items; second scores 1 (wrong) with empty grounding, so no
        # composite hits 1.0 (log(1-x) must stay finite, as in real runs).
        bad = self._item(vqa_score_text="bad", t1=[0.0, 1.0], s1=None)
        bad["answer_spatial"] = {"7": [0, 0, 1, 1]}
        path = tmp_path / "results.json"
        path.write_text(json.dumps([self._item(), bad]))
        ratings = iter([3, 1])
        out = J.evaluate_json(str(path), judge=lambda q, gt, cand: next(ratings), log=lambda *a: None)
        ov = out["overall"]
        assert ov["acc"] == 0.5
        # item1 tIoU 1.0, item2 tIoU 0 -> mean 0.5
        assert ov["mtIoU_1"] == pytest.approx(0.5)
        assert ov["mvIoU_1"] == pytest.approx(0.5)
        assert ov["AM1"] == pytest.approx(0.5)
        # chain 2: both items tIoU = 4/10, spatial 0
        assert ov["mtIoU_2"] == pytest.approx(0.4)
        assert ov["AM2"] == pytest.approx((0.5 + 0.4 + 0.0) / 3)
        import math

        assert ov["mLGM"] == pytest.approx(
            (-(math.log(0.5) + math.log(0.5) + math.log(0.5)) / 3
             - (math.log(0.5) + math.log(0.6) + math.log(1.0)) / 3) / 2
        )

    def test_temporal_salvage_from_pre(self, tmp_path):
        item = self._item(t1=[])
        item["answer_temporal_pre"] = "<answer>from 0:02 to 0:06</answer>"
        path = tmp_path / "results.json"
        path.write_text(json.dumps([item]))
        out = J.evaluate_json(str(path), judge=lambda q, gt, cand: 2, log=lambda *a: None)
        assert out["overall"]["mtIoU_1"] == pytest.approx(1.0)

    def test_invalid_judge_rating_counts_as_zero(self, tmp_path):
        path = tmp_path / "results.json"
        path.write_text(json.dumps([self._item()]))
        out = J.evaluate_json(str(path), judge=lambda q, gt, cand: -1, log=lambda *a: None)
        assert out["overall"]["acc"] == 0.0
        assert out["overall"]["avg_all_rating"] == 0.0


class TestVstarParsers:
    def test_extract_bounding_boxes_list_form(self):
        text = '<answer>[["3", [14, 14, 28, 28]]]</answer>'
        out = vstar.extract_bounding_boxes(text, {"width": 280, "height": 252}, 280, 252)
        assert out == {"3": [14, 14, 28, 28]}

    def test_extract_bounding_boxes_markdown(self):
        text = '<answer>```json\n{"2": [28, 28, 56, 56]}\n```</answer>'
        out = vstar.extract_bounding_boxes(text, {"width": 560, "height": 504}, 280, 252)
        assert out == {"2": [56, 56, 112, 112]}

    def test_fix_incomplete_json(self):
        assert vstar.fix_incomplete_json('{"1": [1,2') == '{"1": [1,2]}'
        assert json.loads(vstar.fix_incomplete_json('{"1": [1,2,3,4'))

    def test_frame_prompt(self):
        p = vstar.create_frame_prompt([0.0, 1.04])
        assert "Frame 1 at 0.0s:" in p and "Frame 2 at 1.0s:" in p
