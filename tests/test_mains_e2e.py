"""End-to-end CLI tests for the training mains.

Drives sft_main and grpo_main through their REAL entry points (argv ->
dataset json -> video decode -> train steps -> checkpoint -> resume ->
safetensors export) with a tiny real-token-id model exported to disk —
the same flow a user runs via scripts/run_{sft,grpo}_video.sh.
"""

import json
import os
import sys

import numpy as np
import pytest

import jax.numpy as jnp

EXAMPLE_VIDEO = "/root/reference/eval/example_video.mp4"

pytestmark = pytest.mark.skipif(
    not os.path.exists(EXAMPLE_VIDEO), reason="example video not mounted"
)


@pytest.fixture(scope="module")
def model_dir(tmp_path_factory):
    """Tiny model with REAL Qwen token ids, exported as a loadable dir."""
    from open_o3_video_tpu.models.qwen25vl import Qwen25VLConfig, params as P
    from open_o3_video_tpu.train import checkpoint as CKPT

    cfg = Qwen25VLConfig.from_hf_dict({
        "vision_config": {
            "depth": 2, "hidden_size": 64, "intermediate_size": 128,
            "num_heads": 4, "patch_size": 14, "window_size": 112,
            "fullatt_block_indexes": [1], "out_hidden_size": 64,
        },
        "text_config": {
            "vocab_size": 152064, "hidden_size": 64, "intermediate_size": 128,
            "num_hidden_layers": 2, "num_attention_heads": 4,
            "num_key_value_heads": 2,
            "rope_scaling": {"type": "mrope", "mrope_section": [2, 3, 3]},
        },
    }, dtype=jnp.float32)
    params = P.init(cfg, seed=0)
    out = str(tmp_path_factory.mktemp("model"))
    CKPT.export_safetensors(params, cfg, out)
    assert os.path.exists(os.path.join(out, "config.json"))
    return out


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("data")
    for sub in ("tvg_r1", "videor1"):
        d = root / "videos" / sub
        d.mkdir(parents=True)
        os.symlink(EXAMPLE_VIDEO, d / "clip.mp4")
    return str(root)


def _run_main(main_fn, argv):
    old = sys.argv
    sys.argv = ["prog"] + argv
    try:
        main_fn()
    finally:
        sys.argv = old


class TestSFTMainE2E:
    def test_train_checkpoint_resume_export(self, model_dir, data_root, tmp_path):
        from open_o3_video_tpu.train import sft_main

        ds = [
            {
                "task": "temporal QA",
                "source": "TVG_tiny",
                "video_path": "clip.mp4",
                "question": "When does the action happen?",
                "reasoning_process": "Looking at <t>1.0</t>s.",
                "answer": "From <t>1.0</t>s to <t>2.0</t>s",
            }
            for _ in range(2)
        ]
        ds_file = tmp_path / "sft.json"
        ds_file.write_text(json.dumps(ds))
        out_dir = str(tmp_path / "ckpt")

        argv = [
            "--model_name_or_path", model_dir,
            "--dataset_name", str(ds_file),
            "--data_root", data_root,
            "--output_dir", out_dir,
            "--max_steps", "2",
            "--save_steps", "1",
            "--nframes", "2",
        ]
        _run_main(sft_main.main, argv)
        from open_o3_video_tpu.train.checkpoint import latest_step

        assert latest_step(out_dir) == 2
        assert os.path.exists(os.path.join(out_dir, "model.safetensors"))
        assert os.path.exists(os.path.join(out_dir, "config.json"))
        card = open(os.path.join(out_dir, "README.md")).read()
        assert "SFT" in card and "generated_from_trainer" in card

        # resume from step 2 and run one more step — UNSHARDED, so the
        # sharded checkpoint restores into a different topology (and the
        # GSPMD recompiles at vocab 152k are skipped; ~6 min saved)
        _run_main(sft_main.main, argv[:-6] + [
            "--max_steps", "3", "--save_steps", "10", "--nframes", "2",
            "--resume_from_checkpoint", out_dir,
            "--mesh_data", "1", "--mesh_fsdp", "1", "--mesh_tensor", "1",
        ])
        assert latest_step(out_dir) == 3

        # the exported dir is itself loadable (weights roundtrip)
        from open_o3_video_tpu.models.qwen25vl import params as P

        params2, cfg2 = P.load_pretrained(out_dir)
        assert cfg2.text.num_hidden_layers == 2


class TestGRPOMainE2E:
    def test_one_gspo_step(self, model_dir, data_root, tmp_path):
        from open_o3_video_tpu.train import grpo_main

        # 4 examples: the reference truncates the train split to a
        # multiple of 4 (data_loader.py:53-54; quirk preserved).
        ds = [{
            "task": "General video QA Free-form",
            "source": "videor1_tiny",
            "video_path": "clip.mp4",
            "question": "What is shown?",
            "answer": "a scene",
            "problem_type": "free-form",
        }] * 4
        ds_file = tmp_path / "rl.json"
        ds_file.write_text(json.dumps(ds))
        out_dir = str(tmp_path / "ckpt_rl")

        _run_main(grpo_main.main, [
            "--model_name_or_path", model_dir,
            "--dataset_name", str(ds_file),
            "--data_root", data_root,
            "--output_dir", out_dir,
            "--max_steps", "1",
            "--num_generations", "2",
            "--max_completion_length", "4",
            "--nframes", "2",
            "--save_steps", "10",
            # unsharded: GSPMD compiles at vocab 152k on 8 CPU devices are
            # minutes each; meshed GSPO is covered by test_dp_training +
            # test_multihost.
            "--mesh_data", "1", "--mesh_fsdp", "1", "--mesh_tensor", "1",
        ])
        from open_o3_video_tpu.train.checkpoint import latest_step

        assert latest_step(out_dir) == 1
        assert os.path.exists(os.path.join(out_dir, "model.safetensors"))
        card = open(os.path.join(out_dir, "README.md")).read()
        assert "GSPO" in card and "DeepSeekMath" in card


class TestLoraMainsE2E:
    def test_sft_peft_train_and_merged_export(self, model_dir, data_root, tmp_path):
        """--use_peft drives the reference's PEFT path end-to-end: LoRA
        train steps, adapter checkpoints, merged safetensors export."""
        from open_o3_video_tpu.train import sft_main

        ds = [
            {
                "task": "temporal QA",
                "source": "TVG_tiny",
                "video_path": "clip.mp4",
                "question": "When?",
                "reasoning_process": "At <t>1.0</t>s.",
                "answer": "From <t>1.0</t>s to <t>2.0</t>s",
            }
            for _ in range(2)
        ]
        ds_file = tmp_path / "sft.json"
        ds_file.write_text(json.dumps(ds))
        out_dir = str(tmp_path / "ckpt_lora")
        _run_main(sft_main.main, [
            "--model_name_or_path", model_dir,
            "--dataset_name", str(ds_file),
            "--data_root", data_root,
            "--output_dir", out_dir,
            "--max_steps", "1",
            "--save_steps", "1",
            "--nframes", "2",
            "--use_peft", "--lora_r", "4", "--lora_alpha", "8",
            "--mesh_data", "1", "--mesh_fsdp", "1", "--mesh_tensor", "1",
        ])
        # merged export is a standard, loadable checkpoint dir
        from open_o3_video_tpu.models.qwen25vl import params as P

        params2, cfg2 = P.load_pretrained(out_dir)
        assert cfg2.text.num_hidden_layers == 2
