"""LR-schedule parity vs the HF/TRL schedulers the reference trains with.

The reference SFT/RL runs use transformers' get_scheduler through TRL
(constant for SFT per run_sft_video.sh; cosine available via
--lr_scheduler_type). Pins our optax schedules to the actual
transformers.optimization implementations, step for step."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from open_o3_video_tpu.train.sft import SFTConfig, make_optimizer


def _hf_lrs(name, lr, warmup, total):
    from transformers import get_scheduler

    opt = torch.optim.AdamW([torch.nn.Parameter(torch.zeros(1))], lr=lr)
    sched = get_scheduler(name, optimizer=opt, num_warmup_steps=warmup,
                          num_training_steps=total)
    out = []
    for _ in range(total):
        out.append(opt.param_groups[0]["lr"])
        opt.step()
        sched.step()
    return np.asarray(out)


def _ours_lrs(cfg: SFTConfig):
    import optax

    if cfg.lr_schedule == "cosine":
        sched = optax.warmup_cosine_decay_schedule(
            0.0, cfg.learning_rate, cfg.warmup_steps, cfg.total_steps
        )
    else:
        sched = (
            optax.linear_schedule(cfg.learning_rate, cfg.learning_rate, 1)
            if cfg.warmup_steps == 0
            else optax.join_schedules(
                [optax.linear_schedule(0.0, cfg.learning_rate, cfg.warmup_steps),
                 optax.constant_schedule(cfg.learning_rate)],
                [cfg.warmup_steps],
            )
        )
    return np.asarray([float(sched(i)) for i in range(cfg.total_steps)])


def test_cosine_with_warmup_matches_hf():
    lr, warmup, total = 2e-5, 10, 100
    hf = _hf_lrs("cosine", lr, warmup, total)
    ours = _ours_lrs(SFTConfig(learning_rate=lr, warmup_steps=warmup,
                               total_steps=total, lr_schedule="cosine"))
    np.testing.assert_allclose(ours, hf, rtol=1e-6, atol=1e-12)


def test_constant_with_warmup_matches_hf():
    lr, warmup, total = 1e-6, 8, 50
    hf = _hf_lrs("constant_with_warmup", lr, warmup, total)
    ours = _ours_lrs(SFTConfig(learning_rate=lr, warmup_steps=warmup,
                               total_steps=total, lr_schedule="constant"))
    np.testing.assert_allclose(ours, hf, rtol=1e-6, atol=1e-12)


def test_constant_no_warmup_matches_reference_sft():
    """run_sft_video.sh trains at constant 1e-6 (no warmup)."""
    lr, total = 1e-6, 20
    hf = _hf_lrs("constant", lr, 0, total)
    ours = _ours_lrs(SFTConfig(learning_rate=lr, warmup_steps=0,
                               total_steps=total, lr_schedule="constant"))
    np.testing.assert_allclose(ours, hf, rtol=1e-6)


def test_make_optimizer_builds():
    for sched in ("constant", "cosine"):
        opt = make_optimizer(SFTConfig(lr_schedule=sched, warmup_steps=5,
                                       total_steps=50))
        assert opt is not None
