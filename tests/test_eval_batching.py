"""Batched-eval correctness: batched engine paths == sequential paths.

The reference amortized eval over an 8-GPU process fleet
(test_vstar_multi_images.py:621-693); the rebuild batches requests through
the engine instead. These tests pin that batching is output-invariant
(greedy sampling), using a tiny random-weight model on the example video.
"""

import json
import os

import numpy as np
import pytest

import jax

EXAMPLE_VIDEO = "/root/reference/eval/example_video.mp4"

pytestmark = pytest.mark.skipif(
    not os.path.exists(EXAMPLE_VIDEO), reason="example video not mounted"
)


@pytest.fixture(scope="module")
def engine_model():
    from open_o3_video_tpu.data.processor import ByteTokenizer, O3VideoProcessor
    from open_o3_video_tpu.eval.model_engine import QwenVLEngine
    from open_o3_video_tpu.models.qwen25vl import Qwen25VLConfig, params as P

    cfg = Qwen25VLConfig.tiny()
    params = P.init(cfg, seed=0)
    processor = O3VideoProcessor(tokenizer=ByteTokenizer.for_config(cfg))
    return QwenVLEngine(
        params,
        rt_shape=True,
        cfg=cfg,
        processor=processor,
        temperature=0.0,
        max_tokens=8,
        video_max_pixels=16 * 28 * 28,
        video_max_frames=2,
    )


def _vstar_item(idx=0):
    return {
        "vid": f"item{idx}",
        "video_path": EXAMPLE_VIDEO,
        "question": "What is the object?",
        "temporal_question": "When does it appear?",
        "spatial_question": "Where is it?",
        "spatial_question_2": "Where is it exactly?",
        "timestamps": [1.0, 3.0],
        "frame_count": 491,
        "fps": 22.29,
        "width": 640,
        "height": 360,
        "domain": "test",
        "answer": "a ball",
        "bboxes": [
            {"timestamp": 1, "xmin": 10, "ymin": 10, "xmax": 60, "ymax": 60},
        ],
        "original_index": idx,
    }


class TestVStarBatching:
    def test_batched_items_match_sequential(self, engine_model, tmp_path):
        from open_o3_video_tpu.eval import vstar

        items = [_vstar_item(0), _vstar_item(1)]
        seq = [vstar.process_item(dict(it), "", engine_model) for it in items]
        batched = vstar.process_items_batched([dict(it) for it in items], "", engine_model)
        assert len(batched) == len(seq) == 2
        for s, b in zip(seq, batched):
            for key in ("answer_vqa", "answer_temporal_pre", "answer_spatial_pre",
                        "answer_spatial_pre_2", "answer_temporal_pre_2"):
                assert s[key] == b[key], key

    def test_evaluate_writes_ordered_results_and_errors(self, engine_model, tmp_path):
        from open_o3_video_tpu.eval import vstar

        anno = [_vstar_item(0), {**_vstar_item(1), "video_path": "/nonexistent.mp4"}]
        anno_file = tmp_path / "anno.json"
        anno_file.write_text(json.dumps(anno))
        out_file = str(tmp_path / "out.json")
        results = vstar.evaluate(str(anno_file), "", engine_model, out_file, item_batch=4)
        # bad item skipped + recorded, run completes
        assert len(results) == 1
        assert results[0]["original_index"] == 0
        errs = json.loads((tmp_path / "out_errors.json").read_text())
        assert len(errs) == 1 and errs[0]["vid"] == "item1"


class TestEngineBatchSurfaces:
    def test_inference_wo_process_batch_matches_single(self, engine_model):
        inputs = [
            {"prompt": "Hello there", "multi_modal_data": {}},
            {"prompt": "Another prompt entirely", "multi_modal_data": {}},
        ]
        singles = [engine_model.inference_wo_process([i]) for i in inputs]
        batched = engine_model.inference_wo_process_batch(inputs)
        assert batched == singles

    def test_generate_paths_batches_n(self, engine_model):
        outs, frames, fps, shape = engine_model.generate_paths(
            EXAMPLE_VIDEO, "Describe the video.", None, 3
        )
        assert len(outs) == 3
        assert frames.ndim == 4
        # greedy: all paths identical, and equal to a single __call__
        single, _, _, _ = engine_model(
            [EXAMPLE_VIDEO], ["Describe the video."], query_image=[None]
        )
        assert outs[0] == outs[1] == outs[2] == single[0]

    def test_scorer_batch_matches_single(self, engine_model):
        from PIL import Image

        crop = Image.fromarray(np.zeros((56, 56, 3), dtype=np.uint8))
        msgs = [{"role": "user", "content": [
            {"type": "image", "image": crop},
            {"type": "text", "text": "Rate relevance 0-2."},
        ]}]
        single = engine_model.run_images_scorer(msgs, [crop])
        batched = engine_model.run_images_scorer_batch([(msgs, [crop]), (msgs, [crop])])
        assert batched == [single, single]


class TestEngineJudgeBatch:
    def test_batch_matches_single_calls(self):
        """judge.batch == per-call judge() on a real (tiny) engine; the
        reference judge scores one answer per 72B forward
        (eval_vstar.py:43-73)."""
        from open_o3_video_tpu.data.processor import ByteTokenizer, O3VideoProcessor
        from open_o3_video_tpu.eval.judge import EngineJudge
        from open_o3_video_tpu.models.qwen25vl import Qwen25VLConfig, params as P

        cfg = Qwen25VLConfig.tiny()
        params = P.init(cfg, seed=3)
        judge = EngineJudge(
            params, cfg=cfg, max_new_tokens=4,
            processor=O3VideoProcessor(tokenizer=ByteTokenizer.for_config(cfg)),
        )
        jobs = [
            ("What color?", "red", "red"),
            ("How many?", "three", "two"),
            ("Where?", "left", "on the left side"),
        ]
        singles = [judge(*j) for j in jobs]
        batched = judge.batch(jobs)
        assert batched == singles
        assert all(isinstance(r, int) for r in batched)


class TestVideoMMERealEngine:
    def test_confidence_voting_end_to_end(self, engine_model, tmp_path):
        """Full VideoMME evaluate() with the REAL engine: generate_paths
        (N sampled paths, one video decode), TTS evidence crops scored by
        the model itself (run_images_scorer_batch), aggregation + output
        file. Scripted fakes cover the logic; this pins the engine+harness
        integration."""
        pd = pytest.importorskip("pandas")
        from open_o3_video_tpu.eval import videomme

        root = tmp_path / "mme"
        (root / "videomme").mkdir(parents=True)
        (root / "data").mkdir()
        os.symlink(EXAMPLE_VIDEO, root / "data" / "vid1.mp4")
        df = pd.DataFrame([
            {
                "videoID": "vid1", "question_id": "q1", "duration": "short",
                "domain": "Knowledge", "sub_category": "Law",
                "task_type": "OCR Problems", "question": "What letter?",
                "options": ["A. x", "B. y", "C. z", "D. w"], "answer": "A",
            },
        ])
        df.to_parquet(root / "videomme" / "test-00000-of-00001.parquet")

        out_file = str(tmp_path / "out.json")
        score = videomme.evaluate(
            engine_model, str(root), out_file, N=2, vote="confidence_voting"
        )
        data = json.load(open(out_file))
        # tiny random model answers garbage; the pipeline itself must
        # complete, record the item, and produce a numeric score
        assert len(data["results"]) == 1
        assert data["errors"] == []
        assert isinstance(score, float)


class TestMCQItemBatching:
    def test_generate_paths_batch_matches_single(self, engine_model):
        items = [
            (EXAMPLE_VIDEO, "Describe the video.", None),
            (EXAMPLE_VIDEO, "What happens first?", None),
        ]
        batched = engine_model.generate_paths_batch(items, 2)
        assert len(batched) == 2
        for (vp, txt, img), (outs_b, frames, fps, shape) in zip(items, batched):
            outs_s, _, fps_s, shape_s = engine_model.generate_paths(vp, txt, img, 2)
            assert list(outs_b) == list(outs_s)
            assert shape == shape_s and fps == fps_s
            assert frames.ndim == 4

    def test_batched_mcq_items_match_sequential(self, engine_model):
        """K items through the batched core == K evaluate_mcq_item calls
        (greedy): same paths, same votes, same predictions."""
        from open_o3_video_tpu.eval.mcq_harness import (
            evaluate_mcq_item,
            evaluate_mcq_items_batched,
        )

        docs = [
            {"question_id": f"q{i}", "question": f"What letter {i}?",
             "options": ["A. x", "B. y", "C. z", "D. w"], "answer": "A"}
            for i in range(2)
        ]
        specs = [
            {"video_path": EXAMPLE_VIDEO, "text_input": d["question"],
             "image": None, "doc": d,
             "question_for_scorer": d["question"] + "\n" + "\n".join(d["options"])}
            for d in docs
        ]
        seq = [
            evaluate_mcq_item(
                engine_model, s["video_path"], s["text_input"], s["image"],
                s["doc"], N=2, vote="confidence_voting",
                question_for_scorer=s["question_for_scorer"],
            )
            for s in specs
        ]
        batched = evaluate_mcq_items_batched(
            engine_model, specs, N=2, vote="confidence_voting"
        )
        assert len(batched) == 2
        for a, b in zip(seq, batched):
            assert a["paths"] == b["paths"]
            assert a["pred"] == b["pred"]
            assert a["choice_score"] == b["choice_score"]
            assert a["think"] == b["think"]


class TestPipelinedPrefetch:
    def test_iter_mcq_item_batches_matches_unpipelined(self, engine_model):
        """The prefetching iterator (host prep of chunk k+1 overlapped with
        chunk k's engine phase) must yield byte-identical results to the
        plain batched path, in chunk order."""
        from open_o3_video_tpu.eval.mcq_harness import (
            evaluate_mcq_items_batched,
            iter_mcq_item_batches,
        )

        docs = [
            {"question_id": f"q{i}", "question": f"What letter {i}?",
             "options": ["A. x", "B. y", "C. z", "D. w"], "answer": "A"}
            for i in range(3)
        ]
        specs = [
            {"video_path": EXAMPLE_VIDEO, "text_input": d["question"],
             "image": None, "doc": d,
             "question_for_scorer": d["question"] + "\n" + "\n".join(d["options"])}
            for d in docs
        ]
        plain = []
        for s in range(0, len(specs), 2):
            plain.extend(evaluate_mcq_items_batched(
                engine_model, specs[s : s + 2], N=2, vote="confidence_voting"
            ))
        piped = []
        for chunk, outs in iter_mcq_item_batches(
            engine_model, specs, 2, N=2, vote="confidence_voting"
        ):
            assert not isinstance(outs, Exception), outs
            assert len(outs) == len(chunk)
            piped.extend(outs)
        assert len(piped) == len(plain) == 3
        for a, b in zip(plain, piped):
            assert a["paths"] == b["paths"]
            assert a["pred"] == b["pred"]
            assert a["choice_score"] == b["choice_score"]

    def test_prepare_generate_split_matches_fused(self, engine_model):
        """prepare_paths_batch + generate_paths_prepared == the fused
        generate_paths_batch."""
        items = [
            (EXAMPLE_VIDEO, "Describe the video.", None),
            (EXAMPLE_VIDEO, "What happens first?", None),
        ]
        fused = engine_model.generate_paths_batch(items, 2)
        prepped = engine_model.prepare_paths_batch(items)
        split = engine_model.generate_paths_prepared(prepped, 2)
        assert len(fused) == len(split) == 2
        for (ob, _, fpb, shb), (os_, _, fps_, shs) in zip(fused, split):
            assert list(ob) == list(os_)
            assert fpb == fps_ and shb == shs

    def test_vstar_prefetched_evaluate_matches(self, engine_model, tmp_path):
        """vstar.evaluate (now prefetching chunk k+1's host prep) ==
        direct process_items_batched results."""
        from open_o3_video_tpu.eval import vstar

        items = [_vstar_item(0), _vstar_item(1), _vstar_item(2)]
        direct = vstar.process_items_batched(
            [dict(it) for it in items[:2]], "", engine_model
        ) + vstar.process_items_batched(
            [dict(it) for it in items[2:]], "", engine_model
        )
        anno_file = tmp_path / "anno.json"
        anno_file.write_text(json.dumps(items))
        out_file = str(tmp_path / "out.json")
        results = vstar.evaluate(
            str(anno_file), "", engine_model, out_file, item_batch=2
        )
        assert len(results) == 3
        for d, r in zip(direct, results):
            for key in ("answer_vqa", "answer_temporal_pre", "answer_spatial_pre"):
                assert d[key] == r[key], key


def test_cache_dtype_string_mapping():
    """YAML eval configs pass cache_dtype as a string; 'fp8' selects the
    float8 KV arena (the long-context memory knob)."""
    import jax.numpy as jnp

    from open_o3_video_tpu.data.processor import ByteTokenizer, O3VideoProcessor
    from open_o3_video_tpu.eval.model_engine import QwenVLEngine
    from open_o3_video_tpu.models.qwen25vl import Qwen25VLConfig, params as P

    cfg = Qwen25VLConfig.tiny()
    params = P.init(cfg, seed=0)
    eng = QwenVLEngine(
        params, cfg=cfg,
        processor=O3VideoProcessor(tokenizer=ByteTokenizer.for_config(cfg)),
        cache_dtype="fp8", max_kv_gb=2.0,
    )
    assert eng.engine.cache_dtype == jnp.float8_e4m3fn
    assert eng.engine.max_kv_gb == 2.0
