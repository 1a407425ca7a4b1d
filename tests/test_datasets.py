"""Data pipeline tests: processor expansion, RL/SFT sample preparation."""

import json
import os
import shutil

import numpy as np
import pytest
from PIL import Image

from open_o3_video_tpu.data.processor import ByteTokenizer, O3VideoProcessor, render_chat
from open_o3_video_tpu.data import rl_dataset as RL
from open_o3_video_tpu.data import sft_dataset as SFT
from open_o3_video_tpu.models.qwen25vl import Qwen25VLConfig

EXAMPLE_VIDEO = "/root/reference/eval/example_video.mp4"


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    if not os.path.exists(EXAMPLE_VIDEO):
        pytest.skip("example video not mounted")
    root = tmp_path_factory.mktemp("data_root")
    videos = root / "videos"
    (videos / "stgr/temporal_grounding/videos").mkdir(parents=True)
    (videos / "stgr/temporal_grounding/kfs").mkdir(parents=True)
    (videos / "tvg_r1").mkdir(parents=True)
    (videos / "treevgr").mkdir(parents=True)
    os.symlink(EXAMPLE_VIDEO, videos / "stgr/temporal_grounding/videos/vid.mp4")
    os.symlink(EXAMPLE_VIDEO, videos / "tvg_r1/vid.mp4")
    Image.new("RGB", (320, 180), (200, 30, 30)).save(
        videos / "stgr/temporal_grounding/kfs/kf1.jpg"
    )
    Image.new("RGB", (640, 480), (30, 200, 30)).save(videos / "treevgr/img1.jpg")
    return str(root)


class TestByteTokenizer:
    def test_roundtrip(self):
        tok = ByteTokenizer()
        text = "hello <obj>dog</obj> world"
        assert tok.decode(tok.encode(text)) == text

    def test_specials(self):
        tok = ByteTokenizer()
        ids = tok.encode("<|vision_start|><|image_pad|><|vision_end|>")
        assert ids == [151652, 151655, 151653]
        assert tok.decode(ids, skip_special_tokens=False) == "<|vision_start|><|image_pad|><|vision_end|>"


class TestProcessor:
    def test_chat_render(self):
        msgs = [
            {"role": "system", "content": [{"type": "text", "text": "sys"}]},
            {"role": "user", "content": [{"type": "video"}, {"type": "text", "text": "q"}]},
        ]
        text = render_chat(msgs, add_generation_prompt=True)
        assert "<|im_start|>system\nsys<|im_end|>" in text
        assert "<|vision_start|><|video_pad|><|vision_end|>q" in text
        assert text.endswith("<|im_start|>assistant\n")

    def test_image_expansion_counts(self):
        proc = O3VideoProcessor()
        frame = np.zeros((3, 56, 84), dtype=np.uint8)  # grid 1x4x6 -> 6 tokens
        text = "a <|vision_start|><|image_pad|><|vision_end|> b"
        out = proc(text, images=[frame])
        assert out.grid_thw.tolist() == [[1, 4, 6]]
        assert out.input_ids.count(151655) == 24 // 4
        assert out.pixel_patches.shape == (24, 1176)

    def test_mismatched_placeholders_raise(self):
        proc = O3VideoProcessor()
        with pytest.raises(ValueError):
            proc("no placeholder", images=[np.zeros((3, 28, 28), np.uint8)])


class TestRLDataset:
    def _example(self):
        return {
            "task": "temporal-spatial free-form QA",
            "question": "what happens?",
            "answer": "a thing",
            "source": "STR_xyz",
            "video_path": "vid.mp4",
            "key_frames": [{"time": 3.0, "idx": 0, "path": "kf1.jpg"}],
            "key_items": {"0": {"ball": [[0.1, 0.1, 0.3, 0.3]]}, "1": None},
        }

    def test_load_truncates_mod4(self, tmp_path):
        data = [self._example() | {"question": f"q{i}"} for i in range(6)]
        p = tmp_path / "d.json"
        p.write_text(json.dumps(data))
        out = RL.load_rl_dataset(str(p))
        assert len(out) == 4
        assert out[0]["prompt"][0]["role"] == "system"

    def test_prepare_temporal_spatial(self, data_root):
        proc = O3VideoProcessor()
        sample = RL.prepare_rl_sample(self._example(), proc, data_root, nframes=4)
        # 4 video frames + 1 interleaved keyframe = 5 images
        assert sample["grid_thw"].shape == (5, 3)
        n_tokens = int(sample["grid_thw"].prod(axis=1).sum()) // 4
        assert sample["input_ids"].count(151655) == n_tokens
        kw = sample["reward_kwargs"]
        assert "1" not in kw["key_items"]  # None entry cleaned
        assert kw["image_size"][0] % 28 == 0
        assert "Frame 1 at 0.0s:" in kw["prompt_text_final"]
        assert "The video is in total" in kw["prompt_text_final"]

    def test_prepare_temporal_qa_no_interleave(self, data_root):
        ex = self._example() | {"task": "temporal QA", "source": "TVG_x", "answer": "[1.0, 2.0]"}
        del ex["key_frames"], ex["key_items"]
        ex["key_frames"] = []
        from open_o3_video_tpu.grounding.prompts import make_conversation

        proc = O3VideoProcessor()
        sample = RL.prepare_rl_sample(ex, proc, data_root, nframes=4)
        assert sample["grid_thw"].shape == (4, 3)


class TestSFTDataset:
    def test_visual_qa_collate_rescales_boxes(self, data_root):
        ex = {
            "task": "visual QA",
            "question": "where is it?",
            "answer": "<obj>box</obj><box>[64,48,128,96]</box>",
            "reasoning_process": "I see <box>[64,48,128,96]</box> here",
            "image_path": "img1.jpg",
            "image_size": [640, 480],
            "source": "treevgr",
        }
        prepared = SFT.prepare_sft_example(ex, data_root)
        cfg = Qwen25VLConfig()
        proc = O3VideoProcessor()
        batch = SFT.collate_sft(prepared, proc, cfg, data_root)
        text = ByteTokenizer().decode(batch["input_ids"][0].tolist())
        # 640x480 exceeds the image pixel budget -> resized -> boxes rescaled
        assert "<box>[64,48,128,96]</box>" not in text
        assert "<box>[" in text

    def test_sft_temporal_collate(self, data_root):
        ex = {
            "task": "temporal QA",
            "question": "when?",
            "answer": "From <t>1</t>s to <t>2</t>s",
            "reasoning_process": "thinking at <t>1.5</t>s",
            "video_path": "vid.mp4",
            "source": "tvg",
        }
        prepared = SFT.prepare_sft_example(ex, data_root)
        cfg = Qwen25VLConfig()
        proc = O3VideoProcessor()
        batch = SFT.collate_sft(prepared, proc, cfg, data_root, nframes=4)
        assert batch["input_ids"].shape[0] == 1
        # visual tokens masked in labels
        ids = batch["input_ids"][0]
        labels = batch["labels"][0]
        assert (labels[ids == 151655] == SFT.IGNORE_INDEX).all()
        # frame prompt uses the SFT 'no s' dialect
        text = ByteTokenizer().decode(ids.tolist())
        assert "Frame 1 at 0.0:" in text
        assert batch["position_ids"].shape == (3, 1, ids.shape[0])


def test_rl_sample_vision_token_from_processor(data_root):
    """vision_token_id must come from the processor's (possibly remapped)
    specials, not a hardcoded 151655 — the trainer's placeholder-count
    check keys on it."""
    from open_o3_video_tpu.data.processor import ByteTokenizer
    from open_o3_video_tpu.models.qwen25vl import Qwen25VLConfig

    cfg = Qwen25VLConfig.tiny()
    proc = O3VideoProcessor(tokenizer=ByteTokenizer.for_config(cfg))
    assert proc.image_token_id == cfg.image_token_id != 151655
    ex = {
        "task": "temporal QA", "source": "TVG_x", "answer": "[1.0, 2.0]",
        "question": "when?", "video_path": "vid.mp4",
    }
    sample = RL.prepare_rl_sample(ex, proc, data_root, nframes=4)
    assert sample["vision_token_id"] == cfg.image_token_id
    n_ph = sum(1 for t in sample["input_ids"] if t == cfg.image_token_id)
    assert n_ph > 0  # placeholders actually carry the advertised id


def test_fetch_video_cv2_failure_not_retried(monkeypatch):
    """When cv2 IS the selected backend, a decode failure must surface
    directly instead of re-running the same reader on the same file."""
    import pytest as _pytest

    from open_o3_video_tpu.data import video as V

    calls = {"n": 0}

    def boom(ele):
        calls["n"] += 1
        raise IOError("corrupt")

    monkeypatch.setitem(V.VIDEO_READER_BACKENDS, "cv2", boom)
    monkeypatch.setattr(V, "get_video_reader_backend", lambda: "cv2")
    with _pytest.raises(IOError):
        V.fetch_video({"video": "/nonexistent.mp4", "nframes": 2})
    assert calls["n"] == 1
