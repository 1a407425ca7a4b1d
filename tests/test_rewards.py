"""Golden parity tests for the seven reward functions.

Two layers of testing:
1. Behavioral assertions on hand-built cases (always run).
2. Direct differential testing against the reference implementation at
   /root/reference (skipped when the reference isn't mounted): both
   implementations are fed identical randomized completion batches and must
   agree to 1e-9 on every reward.
"""

import os
import random
import sys

import pytest

from open_o3_video_tpu.grounding import rewards as R

REF_OPEN_R1 = "/root/reference/src/r1-v/src/open_r1"


def _load_reference_rewards():
    if not os.path.isdir(REF_OPEN_R1):
        return None
    sys.path.insert(0, REF_OPEN_R1)
    try:
        import reward_func as ref

        return ref
    except Exception:
        return None
    finally:
        sys.path.remove(REF_OPEN_R1)


REF = _load_reference_rewards()


def comp(text):
    return [{"role": "assistant", "content": text}]


# ---------------------------------------------------------------- behavioral


class TestFormatReward:
    def test_full_grounding_scores_one(self):
        text = (
            "<think>I see <obj>dog</obj><box>[1,2,3,4]</box>at<t>2.0</t>s running."
            "</think><answer>a dog</answer>"
        )
        assert R.format_reward([comp(text)], task=["temporal-spatial free-form QA"]) == [1.0]

    def test_think_answer_only_scores_half(self):
        text = "<think>plain reasoning</think><answer>yes</answer>"
        assert R.format_reward([comp(text)], task=["temporal-spatial free-form QA"]) == [0.5]

    def test_missing_answer_scores_zero(self):
        assert R.format_reward([comp("<think>x</think>")], task=["visual QA"]) == [0.0]

    def test_unbalanced_tags_score_zero(self):
        text = "<think><obj>dog</obj><obj>cat<box>[1,2,3,4]</box></think><answer>y</answer>"
        assert R.format_reward([comp(text)], task=["visual QA"]) == [0.0]

    def test_temporal_needs_two_time_tags(self):
        one_t = "<think>at <t>3</t>s</think><answer>From <t>1</t>s to <t>2</t>s</answer>"
        two_t = "<think><t>3</t>s and <t>5</t>s</think><answer>x</answer>"
        assert R.format_reward([comp(one_t)], task=["temporal QA"]) == [0.5]
        assert R.format_reward([comp(two_t)], task=["temporal QA"]) == [1.0]

    def test_general_video_qa_always_full_when_balanced(self):
        text = "<think>reasoning</think><answer>B</answer>"
        assert R.format_reward([comp(text)], task=["General video QA MCQ"]) == [1.0]


class TestAnsAcc:
    def test_mcq_letter_variants(self):
        for ans in ["B", "B.", "(B)", "[B]"]:
            text = f"<think>t</think><answer>{ans}</answer>"
            out = R.ans_acc_reward([comp(text)], answer=["B"], task=["General video QA MCQ"])
            assert out == [1.0], ans

    def test_tg_mcq_correct_option(self):
        text = "<think>t</think><answer>From <t>1</t>s to <t>2</t>s.\nCorrect Option: C</answer>"
        out = R.ans_acc_reward([comp(text)], answer=["C\n[1.0, 2.0]"], task=["temporal QA (MCQ)"])
        assert out == [1.0]

    def test_free_form_rouge_identity(self):
        text = "<think>t</think><answer>the red ball bounces high</answer>"
        out = R.ans_acc_reward(
            [comp(text)],
            answer=["the red ball bounces high"],
            task=["temporal-spatial free-form QA"],
        )
        assert out[0] == pytest.approx(1.0)

    def test_scored_zero_for_grounding_tasks(self):
        text = "<think>t</think><answer>whatever</answer>"
        assert R.ans_acc_reward([comp(text)], answer=["x"], task=["visual QA"]) == [0.0]


class TestAnsTiou:
    def test_perfect_segment(self):
        text = "<think>t</think><answer>From <t>3.0</t>s to <t>9.0</t>s</answer>"
        out = R.ans_tiou_reward([comp(text)], answer=["[3.0, 9.0]"], task=["temporal QA"])
        assert out == [pytest.approx(1.0)]

    def test_partial_overlap(self):
        text = "<think>t</think><answer>From <t>0</t>s to <t>5</t>s</answer>"
        out = R.ans_tiou_reward([comp(text)], answer=["[2.5, 5.0]"], task=["temporal QA"])
        assert out == [pytest.approx(2.5 / 5.0)]

    def test_inverted_segment_is_zero(self):
        text = "<think>t</think><answer>From <t>9</t>s to <t>3</t>s</answer>"
        out = R.ans_tiou_reward([comp(text)], answer=["[3.0, 9.0]"], task=["temporal QA"])
        assert out == [0.0]

    def test_mcq_uses_second_line(self):
        text = "<think>t</think><answer>From <t>1</t>s to <t>2</t>s</answer>"
        out = R.ans_tiou_reward([comp(text)], answer=["B\n[1.0, 2.0]"], task=["temporal QA (MCQ)"])
        assert out == [pytest.approx(1.0)]


class TestAnsViou:
    def test_gqa_rescale_and_iou(self):
        # GT annotated at 100x100, image resized to 200x200 -> GT doubles.
        text = "<think>t</think><answer><obj>cat</obj><box>[20,20,40,40]</box></answer>"
        out = R.ans_viou_reward(
            [comp(text)],
            answer=["<obj>cat</obj><box>[10,10,20,20]</box>"],
            task=["visual QA"],
            image_size=[(100, 100)],
            image_size_refine=[(200, 200)],
        )
        assert out == [pytest.approx(1.0)]


class TestThkTemporalSegment:
    def test_fraction_inside(self):
        text = "<think><t>1</t>s <t>5</t>s <t>9</t>s <t>20</t>s</think><answer>x</answer>"
        out = R.thk_temporal_segment_reward(
            [comp(text)], answer=["[0.0, 10.0]"], task=["temporal QA"]
        )
        assert out == [pytest.approx(3 / 4)]


class TestThkTemporalPoint:
    def test_gaussian_sigma_annealing(self):
        import numpy as np

        text = "<think><obj>a</obj> at <t>5.0</t>s</think><answer>x</answer>"
        kf = [[{"time": 7.0, "idx": 0}]]
        early = R.thk_temporal_point_reward(
            [comp(text)], task=["temporal-spatial free-form QA"],
            key_frames=kf, step_percent=[0.0],
        )
        late = R.thk_temporal_point_reward(
            [comp(text)], task=["temporal-spatial free-form QA"],
            key_frames=kf, step_percent=[0.9],
        )
        assert early[0] == pytest.approx(float(np.exp(-4.0 / (2 * 16))))
        assert late[0] == pytest.approx(float(np.exp(-4.0 / 2)))


class TestThkSpatial:
    def _kwargs(self):
        return dict(
            task=["temporal-spatial free-form QA"],
            key_frames=[[{"time": 4.0, "idx": 2}]],
            key_items=[{"2": {"ball": [[0.1, 0.1, 0.3, 0.3]]}}],
            image_size=[(100, 100)],
        )

    def test_claim_matches_gt(self):
        text = (
            "<think><obj>ball</obj><box>[10,10,30,30]</box>at<t>4.0</t>s</think>"
            "<answer>a ball</answer>"
        )
        out = R.thk_spatial_reward([comp(text)], **self._kwargs())
        assert out == [pytest.approx(1.0)]

    def test_signed_gate_quirk_allows_late_predictions(self):
        # pred_time far LATER than GT keyframe passes the signed pre-check.
        text = (
            "<think><obj>ball</obj><box>[10,10,30,30]</box>at<t>100.0</t>s</think>"
            "<answer>a ball</answer>"
        )
        out = R.thk_spatial_reward([comp(text)], **self._kwargs())
        assert out == [pytest.approx(1.0)]

    def test_early_prediction_outside_gate_scores_zero(self):
        # pred_time 2+ seconds EARLIER than every keyframe fails the gate.
        text = (
            "<think><obj>ball</obj><box>[10,10,30,30]</box>at<t>1.0</t>s</think>"
            "<answer>a ball</answer>"
        )
        out = R.thk_spatial_reward([comp(text)], **self._kwargs())
        assert out == [0.0]


# -------------------------------------------------------------- differential


def _random_completion(rng):
    pieces = []
    if rng.random() < 0.9:
        think = []
        for _ in range(rng.randint(0, 3)):
            roll = rng.random()
            if roll < 0.4:
                think.append(
                    f"<obj>obj{rng.randint(0, 3)}</obj>"
                    f"<box>[{rng.randint(0, 50)},{rng.randint(0, 50)},"
                    f"{rng.randint(51, 100)},{rng.randint(51, 100)}]</box>"
                    f"at<t>{round(rng.uniform(0, 12), 1)}</t>s"
                )
            elif roll < 0.7:
                think.append(f"saw something at <t>{round(rng.uniform(0, 12), 1)}</t>s")
            else:
                think.append("plain text reasoning")
        pieces.append("<think>" + " ".join(think) + "</think>")
    ans_roll = rng.random()
    if ans_roll < 0.25:
        pieces.append(f"<answer>From <t>{rng.randint(0, 5)}</t>s to <t>{rng.randint(4, 12)}</t>s</answer>")
    elif ans_roll < 0.5:
        pieces.append(f"<answer>{rng.choice('ABCD')}</answer>")
    elif ans_roll < 0.75:
        pieces.append("<answer><obj>cat</obj><box>[12,12,44,44]</box></answer>")
    elif ans_roll < 0.95:
        pieces.append("<answer>the red ball bounces</answer>")
    return [{"role": "assistant", "content": "".join(pieces)}]


def _random_kwargs(rng, task, n):
    answers = {
        "visual QA": "<obj>cat</obj><box>[10,10,20,20]</box>",
        "temporal QA": "[2.0, 8.0]",
        "temporal QA (MCQ)": "B\n[2.0, 8.0]",
        "temporal-spatial free-form QA": "the red ball bounces",
        "General video QA MCQ": "B",
        "General video QA Free-form": "the red ball bounces",
    }
    return dict(
        task=[task] * n,
        answer=[answers[task]] * n,
        key_frames=[[{"time": 4.0, "idx": 0}, {"time": 9.0, "idx": 1}]] * n,
        key_items=[
            {
                "0": {"ball": [[0.1, 0.1, 0.44, 0.44]]},
                "1": {"cup": [[0.2, 0.2, 0.6, 0.6]], "dog": [[0.0, 0.0, 0.3, 0.3]]},
            }
        ]
        * n,
        image_size=[(100, 100)] * n,
        image_size_refine=[(128, 72)] * n,
        step_percent=[rng.random()] * n,
    )


ALL_TASKS = [
    "visual QA",
    "temporal QA",
    "temporal QA (MCQ)",
    "temporal-spatial free-form QA",
    "General video QA MCQ",
    "General video QA Free-form",
]

PAIRS = [
    ("ans_acc_reward", True),
    ("ans_tiou_reward", True),
    ("ans_viou_reward", True),
    ("format_reward", False),
    ("thk_temporal_segment_reward", False),
    ("thk_temporal_point_reward", False),
    ("thk_spatial_reward", False),
]


@pytest.mark.skipif(REF is None, reason="reference repo not mounted")
@pytest.mark.parametrize("fn_name,takes_answer", PAIRS)
@pytest.mark.parametrize("task", ALL_TASKS)
def test_differential_vs_reference(fn_name, takes_answer, task):
    rng = random.Random(hash((fn_name, task)) & 0xFFFF)
    n = 8
    completions = [_random_completion(rng) for _ in range(n)]
    kwargs = _random_kwargs(rng, task, n)

    ours_fn = getattr(R, fn_name)
    ref_fn = getattr(REF, fn_name)

    import copy

    ours = ours_fn(completions=copy.deepcopy(completions), **copy.deepcopy(kwargs))
    theirs = ref_fn(completions=copy.deepcopy(completions), **copy.deepcopy(kwargs))
    assert ours == pytest.approx(theirs, abs=1e-9), (
        f"{fn_name} diverged on task={task}: ours={ours} ref={theirs}"
    )


@pytest.mark.skipif(REF is None, reason="reference repo not mounted")
@pytest.mark.parametrize("seed", range(6))
def test_differential_heterogeneous_fuzz(seed):
    """Broader fuzz: varying keyframe counts, multi-box claims, multi-object
    key_items, mismatched image sizes, MCQ answer variants."""
    import copy

    rng = random.Random(1000 + seed)
    task = rng.choice(ALL_TASKS)
    n = 8

    def boxes_block():
        return "".join(
            f"<box>[{rng.randint(0, 40)},{rng.randint(0, 40)},{rng.randint(41, 99)},{rng.randint(41, 99)}]</box>"
            for _ in range(rng.randint(1, 3))
        )

    def completion():
        think = []
        for _ in range(rng.randint(0, 4)):
            roll = rng.random()
            if roll < 0.5:
                think.append(f"<obj>o{rng.randint(0, 2)}</obj>{boxes_block()}at<t>{round(rng.uniform(-2, 20), 1)}</t>s")
            elif roll < 0.8:
                think.append(f"at <t>{round(rng.uniform(0, 20), 1)}</t>s")
            else:
                think.append("plain")
        ans = rng.choice([
            f"From <t>{rng.randint(0, 6)}</t>s to <t>{rng.randint(3, 20)}</t>s",
            rng.choice("ABCD") + rng.choice(["", ".", ")"]),
            f"From <t>1</t>s to <t>5</t>s.\nCorrect Option: {rng.choice('ABCD')}",
            "<obj>cat</obj><box>[5,5,25,25]</box>",
            "the quick brown fox jumps",
            "",
        ])
        return [{"role": "assistant", "content": f"<think>{' '.join(think)}</think><answer>{ans}</answer>"}]

    n_kf = rng.randint(1, 4)
    key_frames = [{"time": round(rng.uniform(0, 15), 1), "idx": i} for i in range(n_kf)]
    key_items = {
        str(i): {
            f"obj{j}": [[round(rng.uniform(0, 0.4), 2), round(rng.uniform(0, 0.4), 2),
                         round(rng.uniform(0.5, 1.0), 2), round(rng.uniform(0.5, 1.0), 2)]
                        for _ in range(rng.randint(1, 2))]
            for j in range(rng.randint(1, 3))
        }
        for i in range(n_kf)
    }
    answers = {
        "visual QA": f"<obj>cat</obj><box>[{rng.randint(0, 20)},{rng.randint(0, 20)},{rng.randint(30, 90)},{rng.randint(30, 90)}]</box>",
        "temporal QA": f"[{round(rng.uniform(0, 5), 1)}, {round(rng.uniform(6, 20), 1)}]",
        "temporal QA (MCQ)": f"{rng.choice('ABCD')}\n[{round(rng.uniform(0, 5), 1)}, {round(rng.uniform(6, 20), 1)}]",
        "temporal-spatial free-form QA": "the quick brown fox",
        "General video QA MCQ": rng.choice("ABCD"),
        "General video QA Free-form": "the quick brown fox",
    }
    completions = [completion() for _ in range(n)]
    kwargs = dict(
        task=[task] * n,
        answer=[answers[task]] * n,
        key_frames=[key_frames] * n,
        key_items=[key_items] * n,
        image_size=[(rng.choice([100, 224, 640]), rng.choice([100, 180, 480]))] * n,
        image_size_refine=[(rng.choice([112, 196]), rng.choice([84, 140]))] * n,
        step_percent=[rng.random()] * n,
    )
    for fn_name, _ in PAIRS:
        ours = getattr(R, fn_name)(completions=copy.deepcopy(completions), **copy.deepcopy(kwargs))
        theirs = getattr(REF, fn_name)(completions=copy.deepcopy(completions), **copy.deepcopy(kwargs))
        assert ours == pytest.approx(theirs, abs=1e-9), (fn_name, task, seed)
