"""Tests for tag parsers, coordinate converters, IoU, prompts, V-STAR metrics."""

import os

import numpy as np
import pytest

from open_o3_video_tpu.grounding import (
    coords,
    iou,
    prompts,
    tags,
)
from open_o3_video_tpu.eval import metrics_vstar as mv
from open_o3_video_tpu.eval import tts


class TestTags:
    def test_extract_answer(self):
        assert tags.extract_answer("<answer>  hi there </answer>") == "hi there"
        assert tags.extract_answer("no tags") == ""

    def test_parse_claims_multi_box(self):
        think = "<obj>dog</obj><box>[1,2,3,4]</box><box>[5,6,7,8]</box>at<t>3.5</t>s"
        claims = tags.parse_claims(think)
        assert len(claims) == 1
        assert claims[0]["object_name"] == "dog"
        assert claims[0]["timestamp"] == 3.5
        assert claims[0]["bboxes"] == [[1, 2, 3, 4], [5, 6, 7, 8]]

    def test_parse_claims_skips_malformed(self):
        think = "<obj>x</obj><box>[1,2]</box>at<t>oops</t>s <obj>y</obj><box>[1,2,3,4]</box>at<t>2</t>s"
        claims = tags.parse_claims(think)
        assert len(claims) == 1 and claims[0]["object_name"] == "y"

    def test_parse_time_segment_rejects_inverted(self):
        assert tags.parse_time_segment("<t>9</t>s to <t>3</t>s") == []
        assert tags.parse_time_segment("<t>3</t>s to <t>9</t>s") == [3.0, 9.0]

    def test_parse_box_str(self):
        assert tags.parse_box_str("[1, 2, 3, 4]") == [1.0, 2.0, 3.0, 4.0]
        assert tags.parse_box_str("[3,2,1,4]") is None  # x2 < x1
        assert tags.parse_box_str("[1,2,3]") is None
        assert tags.parse_box_str("[a,b,c,d]") is None

    def test_parse_evidence_patterns(self):
        text = "<obj>cat</obj><box>[1,1,5,5]</box>at<t>2.345</t>s"
        out = tags.parse_evidence_patterns(text)
        assert out == [{"obj": "cat", "box_xyxy": [1.0, 1.0, 5.0, 5.0], "t_sec": 2.35}]

    def test_refined_timestamps_clock_format(self):
        assert tags.refined_timestamps("from 1:30 to 2:15") == [90.0, 135.0]
        assert tags.refined_timestamps("<answer>between 3.5 and 7</answer>") == [3.5, 7.0]
        assert tags.refined_timestamps("only 5 here") == []


class TestCoords:
    def test_denormalize(self):
        assert coords.denormalize_box([0.1, 0.2, 0.5, 0.8], (100, 50)) == [10.0, 10.0, 50.0, 40.0]

    def test_espresso_clamps(self):
        # center at (500,500)/1000, size 2000/1000 -> full clamp
        out = coords.espresso_center_to_xyxy([500, 500, 2000, 2000], (100, 100))
        assert out == [0, 0, 100, 100]

    def test_resize_boxes_in_text(self):
        text = "see <box>[10,10,20,20]</box> ok"
        out = coords.resize_boxes_in_text(text, (100, 100), (200, 50))
        assert out == "see <box>[20,5,40,10]</box> ok"

    def test_rewrite_gemini(self):
        text = "<box>[0.1,0.2,0.3,0.4]</box>"
        out = coords.rewrite_gemini_boxes_in_text(text, (100, 100))
        assert out == "<box>[10,20,30,40]</box>"


class TestIoU:
    def test_box_iou_identity(self):
        assert iou.box_iou([0, 0, 10, 10], [0, 0, 10, 10]) == pytest.approx(1.0)

    def test_box_iou_disjoint(self):
        assert iou.box_iou([0, 0, 1, 1], [5, 5, 6, 6]) == 0.0

    def test_box_iou_rejects_non_list(self):
        assert iou.box_iou([0, 0, 1, 1], (0, 0, 1, 1)) == 0.0
        assert iou.box_iou([0, 0, 1, 1], [1, 2, 3]) == 0.0

    def test_segment_iou(self):
        assert iou.segment_iou([0, 10], [5, 15]) == pytest.approx(5 / 15)


class TestPrompts:
    def test_frame_prompt_rl(self):
        p = prompts.frame_prompt_rl(2, 2.0)
        assert "Frame 1 at 0.0s:" in p and "Frame 2 at 0.5s:" in p
        assert p.endswith("The video is in total 1 seconds.\n")

    def test_sft_temporal_has_no_s_suffix(self):
        p = prompts.frame_prompt_sft_temporal(1, 2.0)
        assert "Frame 1 at 0.0: <|vision_start|>" in p

    def test_interleave_plan_rl(self):
        # 4 video frames at 1 fps, keyframe at t=1.4 (rounds to 1)
        plan, prompt = prompts.interleave_keyframes(4, 1.0, [1.4])
        assert plan == [("video", 0), ("kf", 0), ("video", 1), ("video", 2), ("video", 3)]
        assert "Frame 2 at 1s:" in prompt
        assert prompt.count("<|vision_start|>") == 5

    def test_interleave_drops_trailing_keyframes(self):
        plan, _ = prompts.interleave_keyframes(2, 1.0, [100.0])
        assert all(kind == "video" for kind, _ in plan)

    def test_make_conversation_video(self):
        ex = {"task": "temporal QA", "question": "when?"}
        out = prompts.make_conversation(ex)
        assert out["prompt"][0]["role"] == "system"
        assert out["prompt"][1]["content"][0] == {"type": "video"}


class TestVstarMetrics:
    def test_temporal_iou_parsing(self):
        assert mv.temporal_iou([0, 10], "[0, 10]") == pytest.approx(1.0)
        assert mv.temporal_iou([0, 10], "oops") == 0.0
        assert mv.temporal_iou([0, 10], [5]) == 0.0

    def test_spatial_metrics(self):
        gt = [{"timestamp": 3, "xmin": 0, "ymin": 0, "xmax": 10, "ymax": 10}]
        pred = {"3": [0, 0, 10, 10]}
        aps, miou = mv.spatial_metrics(gt, pred)
        assert miou == pytest.approx(1.0)
        assert aps == [1.0] * 5

    def test_spatial_metrics_missing_frame(self):
        gt = [{"timestamp": 3, "xmin": 0, "ymin": 0, "xmax": 10, "ymax": 10}]
        aps, miou = mv.spatial_metrics(gt, {"7": [0, 0, 10, 10]})
        assert miou == 0.0

    def test_am_lgm(self):
        out = mv.aggregate_chains(0.5, 0.5, 0.5, 0.5, 0.5)
        assert out["mAM"] == pytest.approx(0.5)
        import math

        assert out["mLGM"] == pytest.approx(-math.log(0.5))

    def test_duration_buckets(self):
        assert mv.duration_bucket(59.9) == "Short"
        assert mv.duration_bucket(60) == "Medium"
        assert mv.duration_bucket(180) == "Long"


class TestTTS:
    def test_relevance_mapping(self):
        assert tts.relevance_mapping(2) == 1.0
        assert tts.relevance_mapping(1) == 0.6
        assert tts.relevance_mapping(0) == 0.2
        assert tts.relevance_mapping(-1) == 0.2

    def test_crop_box_roundtrip(self):
        import numpy as np

        frame = np.arange(3 * 20 * 30, dtype=np.uint8).reshape(3, 20, 30)
        crop = tts.crop_box(frame, [5, 5, 15, 15])
        assert crop.shape == (3, 20, 30)

    def test_crop_box_empty(self):
        import numpy as np

        frame = np.zeros((3, 20, 30), dtype=np.uint8)
        assert tts.crop_box(frame, [10, 10, 10, 10]) is None

    def test_extract_and_crop_bails_over_limit(self):
        import numpy as np

        frames = [np.ones((3, 8, 8), dtype=np.uint8)] * 40
        info = [{"t_sec": 0.0, "box_xyxy": [0, 0, 8, 8]}] * 11
        assert tts.extract_and_crop(frames, 1.0, info) == []

    def test_scorer_msgs_shape(self):
        msgs = tts.build_image_scorer_msgs(["img1"], "what?")
        assert msgs[0]["role"] == "system"
        assert msgs[1]["content"][0]["text"].endswith("Question: what?")


REF_TTS = "/root/reference/eval/tts.py"


@pytest.mark.skipif(not os.path.exists(REF_TTS), reason="reference repo not mounted")
class TestTTSDifferential:
    """Side-by-side fuzz of the TTS crop-and-score pipeline against the
    reference implementation (eval/tts.py is pure python + cv2)."""

    @pytest.fixture(scope="class")
    def ref(self):
        import importlib.util

        spec = importlib.util.spec_from_file_location("ref_tts", REF_TTS)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod

    def test_parse_patterns_fuzz(self, ref):
        from open_o3_video_tpu.grounding.tags import parse_evidence_patterns

        rng = np.random.default_rng(0)
        cases = [
            "<obj>cat</obj><box>[1,2,3,4]</box>at<t>2.5</t>s and more",
            "<obj>a</obj><box>[1, 2, 3, 4]</box>at<t>1</t>s "
            "<obj>b</obj><box>[9,9,1,1]</box>at<t>x</t>s",  # invalid box+time
            "no patterns here",
            "<obj>x</obj><box>[bad]</box>at<t>3</t>s",
            "<obj>y</obj><box>[0.1,0.2,0.9,0.8]</box>at<t> 4.0 </t>s",
        ]
        for _ in range(60):
            n = rng.integers(0, 4)
            parts = []
            for _ in range(n):
                coords = rng.uniform(-5, 120, 4)
                if rng.random() < 0.5:
                    coords = np.sort(coords.reshape(2, 2), axis=0).T.reshape(-1)
                t = round(float(rng.uniform(-1, 30)), 2) if rng.random() < 0.8 else "oops"
                parts.append(
                    f"<obj>o{rng.integers(0, 9)}</obj><box>[{coords[0]:.1f},{coords[1]:.1f},"
                    f"{coords[2]:.1f},{coords[3]:.1f}]</box>at<t>{t}</t>s filler "
                )
            cases.append("".join(parts))
        for text in cases:
            assert parse_evidence_patterns(text) == ref.parse_patterns(text), text

    def test_crop_and_extract_fuzz(self, ref):
        from open_o3_video_tpu.eval import tts

        rng = np.random.default_rng(1)
        frames = [rng.integers(0, 255, (48, 64, 3), dtype=np.uint8) for _ in range(12)]
        for _ in range(40):
            n = rng.integers(1, 14)  # can exceed the 10-crop bail
            info = []
            for _ in range(n):
                box = sorted(rng.uniform(0, 64, 2)) + sorted(rng.uniform(0, 48, 2))
                box = [box[0], box[2], box[1], box[3]]
                if rng.random() < 0.2:
                    box = [60, 40, 61, 41]  # degenerate-small
                info.append({
                    "obj": "obj",
                    "box_xyxy": [float(b) for b in box],
                    "t_sec": float(rng.uniform(-2, 14)),
                })
            ours = tts.extract_and_crop(frames, 1.0, info)
            theirs = ref.extract_and_crop(frames, 1.0, info)
            assert len(ours) == len(theirs)
            for a, b in zip(ours, theirs):
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_scorer_msgs_and_mapping(self, ref):
        from open_o3_video_tpu.eval import tts

        for s in (-1, 0, 1, 2, 3, 99):
            assert tts.relevance_mapping(s) == ref.relevance_mapping(s)
        msgs_a = tts.build_image_scorer_msgs(["i1", "i2"], "what is it?")
        msgs_b = ref.build_image_scorer_msgs(["i1", "i2"], "what is it?")
        assert msgs_a == msgs_b
