"""WorldSense / VideoMMMU parser + aggregation tests (differential where possible)."""

import os
import random
import sys
import types

import pytest

from open_o3_video_tpu.eval.dataloaders import videommmu as MU
from open_o3_video_tpu.eval.dataloaders import worldsense as WS

REF_DATALOADER = "/root/reference/eval/dataloader"


def _load_ref(name):
    if not os.path.isdir(REF_DATALOADER):
        return None
    if "loguru" not in sys.modules:
        import importlib.machinery

        loguru = types.ModuleType("loguru")
        loguru.__spec__ = importlib.machinery.ModuleSpec("loguru", None)
        loguru.logger = types.SimpleNamespace(info=lambda *a, **k: None)
        sys.modules["loguru"] = loguru
    sys.path.insert(0, REF_DATALOADER)
    try:
        import importlib

        return importlib.import_module(name)
    except Exception:
        return None
    finally:
        sys.path.remove(REF_DATALOADER)


REF_WS = _load_ref("worldsense")
REF_MU = _load_ref("videommmu")


class TestWorldSenseParser:
    @pytest.mark.skipif(REF_WS is None, reason="reference not importable")
    def test_differential(self):
        rng = random.Random(3)
        pieces = ["A", "B.", "(C)", "D:", "**A**", "{B}", "\n", " ", "word", ":", "C\n", "garbage"]
        for _ in range(200):
            response = "".join(rng.choices(pieces, k=rng.randint(1, 6)))
            ours = WS.parse_multi_choice_response(response)
            theirs = REF_WS.parse_multi_choice_response(response)
            assert ours == theirs, repr(response)

    @pytest.mark.skipif(REF_WS is None, reason="reference not importable")
    def test_random_fallback_seeded(self):
        # pure garbage with no choice letters -> both fall back to seed-42 random
        assert WS.parse_multi_choice_response("zzz qqq") == REF_WS.parse_multi_choice_response("zzz qqq")

    def test_empty_is_api_error(self):
        assert WS.parse_multi_choice_response("") == "API Error"


class TestWorldSenseRating:
    def _record(self, score, duration="<1min", domain="Sports", sub="Racing",
                td="Reasoning", tt="Causal Reasoning", audio=("Speech",)):
        return {"score": score, "duration": duration, "domain": domain,
                "sub_category": sub, "task_domain": td, "task_type": tt,
                "audio_class": list(audio)}

    def test_rating_table(self):
        rating = WS.get_dimension_rating([self._record(1), self._record(0, duration="1-2min")])
        assert rating["overall"]["overall"] == "0.500"
        assert rating["<1min"]["domain"]["Sports"] == "1.000"
        assert rating["1-2min"]["domain"]["Sports"] == "0.000"
        assert rating["overall"]["audio_class"]["Speech"] == "0.500"

    def test_process_result_scores(self, tmp_path):
        records = [
            {"prediction": "The answer is B.", "answer": "B", "duration": "<1min",
             "domain": "Sports", "sub_category": "Racing", "task_domain": "Reasoning",
             "task_type": "Causal Reasoning", "audio_class": "['Speech']"},
        ]
        rating = WS.process_result(records, str(tmp_path / "out"))
        assert records[0]["score"] == 1
        assert (tmp_path / "out_rating.json").exists()


class TestVideoMMMU:
    @pytest.mark.skipif(REF_MU is None, reason="reference not importable")
    @pytest.mark.parametrize("response", [
        "The total is 1,234 dollars",
        "so the answer is 42.5",
        "I think it could be the eiffel tower. Therefore x = 3e4",
        "final answer: B",
        "",
        "the value is -0.5",
    ])
    def test_open_response_differential(self, response):
        ours = MU.parse_open_response(response)
        theirs = REF_MU.parse_open_response(response)
        if isinstance(ours, list):
            assert sorted(map(str, ours)) == sorted(map(str, theirs)), response
        else:
            assert ours == theirs

    @pytest.mark.skipif(REF_MU is None, reason="reference not importable")
    def test_extract_numbers_differential(self):
        for s in ["1,234 and 5.6 and 3e8 and -7", "nothing", "x=.5"]:
            assert MU.extract_numbers(s) == REF_MU.extract_numbers(s)

    def test_eval_open_matching(self):
        assert MU.eval_open("42", [42.0])
        assert MU.eval_open(["paris", "london"], ["i think paris is right"])
        assert not MU.eval_open("42", [43.0])

    def test_subject_routing(self):
        assert MU.get_cache_dir("Computer_Science") == "Engineering"
        assert MU.get_cache_dir("Art_Theory") == "Art"
        with pytest.raises(ValueError):
            MU.get_cache_dir("Alchemy")

    def test_extract_subset_name(self):
        assert MU.extract_subset_name("validation_Computer_Science_12") == "Computer_Science"

    def test_aggregate(self):
        results = [
            {"id": "validation_Physics_1", "category": "Perception",
             "subdomain": "Physics", "question_type": "multiple-choice",
             "answer": "A", "parsed_pred": "A"},
            {"id": "validation_Physics_2", "category": "Perception",
             "subdomain": "Physics", "question_type": "multiple-choice",
             "answer": "B", "parsed_pred": "C"},
        ]
        assert MU.aggregate_results(results) == 0.5

    def test_doc_to_text_adaptation(self):
        doc = {"question": "Q?", "options": ["x", "y"], "category": "Adaptation"}
        text = MU.doc_to_text(doc, think_mode=True)[0]
        assert "apply what you learned" in text
        assert "A. x" in text
        assert "MUST NOT be longer than 100 words" in text
