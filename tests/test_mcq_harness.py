"""N-path voting harness tests with a scripted fake model."""

import numpy as np
import pytest

from open_o3_video_tpu.eval.mcq_harness import evaluate_mcq_item


class FakeModel:
    """Scripted outputs; mimics the QwenVLEngine call contract."""

    def __init__(self, outputs, scorer_rating=2):
        self.outputs = list(outputs)
        self.scorer_rating = scorer_rating
        self.scorer_calls = 0
        self.frames = np.zeros((8, 3, 32, 32), dtype=np.uint8)

    def __call__(self, video_paths, queries, query_image):
        out = self.outputs.pop(0)
        return [out], self.frames, 1.0, (32, 32)

    def run_images_scorer(self, msgs, images):
        self.scorer_calls += 1
        return self.scorer_rating


DOC = {"question": "what?", "options": ["a", "b", "c", "d"], "videoID": "v"}


def test_majority_voting_picks_most_common():
    model = FakeModel([
        "<think>x</think><answer>B</answer>",
        "<think>x</think><answer>B</answer>",
        "<think>x</think><answer>C</answer>",
    ])
    out = evaluate_mcq_item(model, "v.mp4", "q", None, DOC, N=3, vote="majority_voting")
    assert out["pred"] == "B"
    assert out["choice_score"] == {"A": 0.0, "B": 2.0, "C": 1.0, "D": 0.0}


def test_confidence_voting_weights_by_evidence_score():
    # One path with grounded evidence scored 2 (weight 1.0) beats two
    # ungrounded paths (weight 0.2 each).
    model = FakeModel(
        [
            "<think>I see <obj>dog</obj><box>[1,1,10,10]</box>at<t>2.0</t>s</think><answer>A</answer>",
            "<think>no evidence</think><answer>B</answer>",
            "<think>no evidence</think><answer>B</answer>",
        ],
        scorer_rating=2,
    )
    out = evaluate_mcq_item(model, "v.mp4", "q", None, DOC, N=3, vote="confidence_voting")
    assert model.scorer_calls == 1  # only the grounded path hit the scorer
    assert out["pred"] == "A"
    assert out["choice_score"]["A"] == pytest.approx(1.0)
    assert out["choice_score"]["B"] == pytest.approx(0.4)


def test_malformed_paths_score_zero():
    model = FakeModel([
        "no tags at all",
        "<answer>E</answer>",  # not in choices
        "<think>ok</think><answer>D</answer>",
    ])
    out = evaluate_mcq_item(model, "v.mp4", "q", None, DOC, N=3, vote="majority_voting")
    assert out["pred"] == "D"


def test_non_think_mode_uses_parser():
    model = FakeModel(["The best answer is C."])
    out = evaluate_mcq_item(model, "v.mp4", "q", None, DOC, N=1, think_mode=False)
    assert out["pred"] == "C"
