"""End-to-end harness tests over synthetic benchmark datasets.

Builds miniature VideoMME parquet / WorldSense TSV / VideoMMMU parquet
datasets on disk (with the example video) and runs the full evaluate()
pipelines with a scripted model, checking output files and scores.
"""

import json
import os

import numpy as np
import pytest

pd = pytest.importorskip("pandas")

EXAMPLE_VIDEO = "/root/reference/eval/example_video.mp4"

pytestmark = pytest.mark.skipif(
    not os.path.exists(EXAMPLE_VIDEO), reason="example video not mounted"
)


class ScriptedModel:
    """Answers every item with a grounded <think>/<answer> trace."""

    def __init__(self, answer="A"):
        from open_o3_video_tpu.data.processor import O3VideoProcessor

        self.answer = answer
        self.video_max_frames = 4
        self.video_max_pixels = 64 * 28 * 28
        self.processor = O3VideoProcessor()

    def __call__(self, video_paths, queries, query_image):
        text = (
            "<think>I see the <obj>ball</obj><box>[10,10,60,60]</box>at<t>2.0</t>s"
            f"</think><answer>{self.answer}</answer>"
        )
        frames = np.zeros((4, 3, 32, 32), dtype=np.uint8)
        return [text], frames, 1.0, (32, 32)

    def run_images_scorer(self, msgs, images):
        return 2

    def inference_wo_process(self, inputs):
        return "<think>t</think><answer>42</answer>"


@pytest.fixture()
def videomme_root(tmp_path):
    root = tmp_path / "mme"
    (root / "videomme").mkdir(parents=True)
    (root / "data").mkdir()
    os.symlink(EXAMPLE_VIDEO, root / "data" / "vid1.mp4")
    df = pd.DataFrame([
        {
            "videoID": "vid1", "question_id": "q1", "duration": "short",
            "domain": "Knowledge", "sub_category": "Law",
            "task_type": "OCR Problems", "question": "What letter (first)?",
            "options": ["A. x", "B. y", "C. z", "D. w"], "answer": "A",
        },
        {
            "videoID": "vid1", "question_id": "q2", "duration": "long",
            "domain": "Knowledge", "sub_category": "Law",
            "task_type": "OCR Problems", "question": "What letter?",
            "options": ["A. x", "B. y", "C. z", "D. w"], "answer": "B",
        },
    ])
    df.to_parquet(root / "videomme" / "test-00000-of-00001.parquet")
    return str(root)


def test_videomme_end_to_end(videomme_root, tmp_path):
    from open_o3_video_tpu.eval import videomme

    out_file = str(tmp_path / "out.json")
    score = videomme.evaluate(
        ScriptedModel("A"), videomme_root, out_file, N=2, vote="majority_voting"
    )
    assert score == 50.0  # one right (A), one wrong (GT B)
    saved = json.load(open(out_file))
    assert saved["overall"] == 50.0
    assert len(saved["results"]) == 2
    assert saved["results"][0]["pred_answer"] == "A"


def test_videomme_confidence_voting(videomme_root, tmp_path):
    from open_o3_video_tpu.eval import videomme

    score = videomme.evaluate(
        ScriptedModel("B"), videomme_root, str(tmp_path / "o.json"),
        N=1, vote="confidence_voting",
    )
    assert score == 50.0  # B right on item 2 only


@pytest.fixture()
def worldsense_root(tmp_path):
    root = tmp_path / "ws"
    root.mkdir()
    os.symlink(EXAMPLE_VIDEO, root / "vid1.mp4")
    (root / "asr").mkdir()
    (root / "asr" / "vid1.wav.txt").write_text("someone talks about bowling")
    df = pd.DataFrame([
        {
            "index": 0, "video": "vid1", "question": "What letter?",
            "candidates": "['A. x', 'B. y', 'C. z', 'D. w']", "answer": "A",
            "duration": "<1min", "domain": "Sports", "sub_category": "Racing",
            "task_domain": "Reasoning", "task_type": "Causal Reasoning",
            "audio_class": "['Speech']",
        },
    ])
    df.to_csv(root / "WorldSense.tsv", sep="\t", index=False)
    return str(root)


def test_worldsense_end_to_end(worldsense_root, tmp_path):
    from open_o3_video_tpu.eval import worldsense

    rating = worldsense.evaluate(
        ScriptedModel("A"), worldsense_root, str(tmp_path / "ws_out"),
        asr_dir=os.path.join(worldsense_root, "asr"), N=1,
    )
    assert rating["overall"]["overall"] == "1.000"
    assert os.path.exists(str(tmp_path / "ws_out") + "_rating.json")
    assert os.path.exists(str(tmp_path / "ws_out") + "_score.json")
    assert os.path.exists(str(tmp_path / "ws_out") + "_score.xlsx")


def test_worldsense_xlsx_contract(tmp_path):
    """The reference's xlsx-in entry (worldsense.py:529-565): predictions
    .xlsx -> _score.xlsx + _rating.json; xlsx written here reads back via
    pandas' openpyxl-free path is unavailable, so roundtrip through our
    reader and through the dump/load multi-format dispatch."""
    from open_o3_video_tpu.eval.dataloaders import worldsense as W

    rows = [
        {
            "index": i, "video": f"vid{i}", "question": "What letter?",
            "prediction": "The answer is A." if i == 0 else "B",
            "answer": "A",
            "duration": "<1min", "domain": "Sports", "sub_category": "Racing",
            "task_domain": "Reasoning", "task_type": "Causal Reasoning",
            "audio_class": "['Speech']",
        }
        for i in range(2)
    ]
    eval_file = str(tmp_path / "preds.xlsx")
    W.dump(rows, eval_file)
    assert W.load(eval_file)[0]["video"] == "vid0"

    rating = W.worldsense_process_result(eval_file)
    assert rating["overall"]["overall"] == "0.500"
    scored = W.load(str(tmp_path / "preds_score.xlsx"))
    assert [int(r["score"]) for r in scored] == [1, 0]
    assert os.path.exists(str(tmp_path / "preds_rating.json"))

    # multi-format dispatch parity: every suffix loads back what it dumped
    for suffix in ("json", "jsonl", "pkl", "csv", "tsv"):
        f = str(tmp_path / f"t.{suffix}")
        W.dump(rows, f)
        back = W.load(f)
        assert len(back) == 2 and str(back[1]["answer"]) == "A"


@pytest.fixture()
def videommmu_root(tmp_path):
    root = tmp_path / "mmmu"
    for category in ("Perception", "Comprehension", "Adaptation"):
        (root / category).mkdir(parents=True)
    (root / "Science").mkdir()
    os.symlink(EXAMPLE_VIDEO, root / "Science" / "validation_Physics_1.mp4")
    base = {
        "id": "validation_Physics_1", "question": "What letter?",
        "options": ["x", "y", "z"], "answer": "A",
        "question_type": "multiple-choice",
    }
    for category in ("Perception", "Comprehension", "Adaptation"):
        pd.DataFrame([dict(base)]).to_parquet(
            root / category / "test-00000-of-00001.parquet"
        )
    return str(root)


def test_videommmu_end_to_end(videommmu_root, tmp_path):
    from open_o3_video_tpu.eval import videommmu

    out_file = str(tmp_path / "mmmu.json")
    acc = videommmu.evaluate(ScriptedModel("A"), videommmu_root, out_file, N=1)
    assert acc == 1.0
    saved = json.load(open(out_file))
    assert saved["overall"] == 1.0
    assert {r["category"] for r in saved["results"]} == {
        "Perception", "Comprehension", "Adaptation"
    }


def test_tvgbench_end_to_end(tmp_path):
    from open_o3_video_tpu.eval import tvgbench

    anno = [
        {"video": "example_video.mp4", "query": "when does the ball roll?",
         "timestamps": [2.0, 8.0], "duration": 22.0},
    ]
    anno_file = tmp_path / "tvg.json"
    anno_file.write_text(json.dumps(anno))

    class TemporalModel(ScriptedModel):
        def inference_wo_process(self, inputs):
            return "<think><t>3</t>s</think><answer>From <t>2.0</t>s to <t>8.0</t>s</answer>"

    out_file = str(tmp_path / "tvg_out.json")
    scores = tvgbench.evaluate(anno_file=str(anno_file),
                               video_folder="/root/reference/eval",
                               model=TemporalModel(), output_file=out_file)
    assert scores["mIoU"] == pytest.approx(1.0)
    assert scores["R1@0.7"] == 1.0
    saved = json.load(open(out_file))
    assert saved["results"][0]["prediction"] == [2.0, 8.0]


def test_videomme_item_failure_skipped_and_recorded(videomme_root, tmp_path):
    """A raising item must be skipped and recorded, not kill the run
    (the reference terminates its whole fleet, test_videomme.py:329-335)."""
    from open_o3_video_tpu.eval import videomme

    class FlakyModel(ScriptedModel):
        # Deterministically fails ITEM q1 (its question text is unique):
        # the batched harness retries a failed batch per item, so a
        # call-counting fake would get "healed" by the retry — the contract
        # under test is that a PERSISTENTLY bad item is skipped+recorded.
        def __call__(self, video_paths, queries, query_image):
            if any("(first)" in q for q in queries):
                raise RuntimeError("corrupt video")
            return super().__call__(video_paths, queries, query_image)

    out_file = str(tmp_path / "out.json")
    score = videomme.evaluate(FlakyModel("B"), videomme_root, out_file, N=1)
    data = json.load(open(out_file))
    assert len(data["errors"]) == 1
    assert len(data["results"]) == 1
    assert score == 100.0  # surviving item is q2 with GT B
