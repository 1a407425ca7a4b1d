"""Multi-row SAMPLED speculative decoding (engine _segment_spec_sample_impl).

The sampled-spec path must be:
  - bit-identical to the plain path at temperature 0 in exact arithmetic
    (sample-and-match degenerates to the greedy scheme), including eos and
    max_tokens truncation and the surplus-exhausted fallback to the plain
    ring path;
  - DISTRIBUTIONALLY exact at temperature > 0: emitted sequences follow
    the sequential sampler's law (sample-and-match acceptance draws every
    position from the true conditional), though from a different rng
    stream — pinned statistically over many seeds;
  - invariant at the GSPO STEP level: reward / KL / completion-length
    telemetry of spec rollouts is statistically indistinguishable from
    plain rollouts (VERDICT r3 item 1 — the training signals must not
    move when the rollout engine switches modes).

Reference envelope: rollouts are grpo_trainer.py:581-586 (temperature 1,
top_p 0.95, G in-process generations).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from open_o3_video_tpu.engine import InferenceEngine, Request, SamplingParams
from open_o3_video_tpu.models.qwen25vl import Qwen25VLConfig, params as P


@pytest.fixture(scope="module")
def cfg_params():
    cfg = Qwen25VLConfig.tiny()
    return cfg, P.init(cfg, seed=0)


def _engines(cfg, params, **kw):
    base = dict(prompt_buckets=(64,), cache_dtype=jnp.float32)
    base.update(kw)
    ss_kw = {k: base.pop(k) for k in ("spec_draft", "spec_surplus")
             if k in base}
    plain = InferenceEngine(params, cfg, spec_sample=False, **base)
    ss = InferenceEngine(
        params, cfg, spec_sample=True,
        spec_draft=ss_kw.get("spec_draft", 4),
        spec_surplus=ss_kw.get("spec_surplus", 96),
        **base,
    )
    assert ss.spec_sample
    # tests drive short generations and control acceptance via replay
    # streams; the plain warmup (48 tokens, for real serving) would keep
    # speculation from ever engaging — tests that cover the warmup set it
    # back explicitly (TestAcceptanceProbe::test_warmup_defers_speculation)
    ss.spec_warmup = 0
    return plain, ss


def _gen(eng, prompts, samp, **kw):
    return eng.generate([Request(input_ids=list(p)) for p in prompts], samp,
                        **kw)


class TestGreedyExactness:
    def test_single_row_temp0_bit_identical(self, cfg_params):
        cfg, params = cfg_params
        plain, ss = _engines(cfg, params)
        samp = SamplingParams(temperature=0.0, repetition_penalty=1.0,
                              max_tokens=24)
        for prompt in ([5, 6, 7, 8, 9], [40, 41, 42, 43, 44, 45, 46]):
            a = _gen(plain, [prompt], samp)[0]
            b = _gen(ss, [prompt], samp)[0]
            assert a["token_ids"] == b["token_ids"], prompt

    def test_multi_row_temp0_bit_identical(self, cfg_params):
        """The GSPO shape: G rows decode together; holes from per-row
        rejection must not leak across rows."""
        cfg, params = cfg_params
        plain, ss = _engines(cfg, params)
        samp = SamplingParams(temperature=0.0, repetition_penalty=1.0,
                              max_tokens=20)
        prompts = [[5, 6, 7], [20, 21, 22, 23], [7, 7, 7, 7], [50, 51]]
        a = _gen(plain, prompts, samp)
        b = _gen(ss, prompts, samp)
        for x, y, p in zip(a, b, prompts):
            assert x["token_ids"] == y["token_ids"], p

    def test_logprobs_match_temp0(self, cfg_params):
        cfg, params = cfg_params
        plain, ss = _engines(cfg, params)
        samp = SamplingParams(temperature=0.0, repetition_penalty=1.0,
                              max_tokens=16)
        prompts = [[9, 8, 7, 6], [11, 12, 13]]
        a = _gen(plain, prompts, samp, return_logprobs=True)
        b = _gen(ss, prompts, samp, return_logprobs=True)
        for x, y in zip(a, b):
            assert x["token_ids"] == y["token_ids"]
            np.testing.assert_allclose(x["logprobs"], y["logprobs"],
                                       rtol=1e-5, atol=1e-5)

    def test_budget_truncation(self, cfg_params):
        cfg, params = cfg_params
        plain, ss = _engines(cfg, params)
        for mt in (2, 3, 5):
            samp = SamplingParams(temperature=0.0, repetition_penalty=1.0,
                                  max_tokens=mt)
            a = _gen(plain, [[7, 7, 7, 7], [5, 6, 7]], samp)
            b = _gen(ss, [[7, 7, 7, 7], [5, 6, 7]], samp)
            for x, y in zip(a, b):
                assert x["token_ids"] == y["token_ids"], mt
                assert len(y["token_ids"]) <= mt

    def test_acceptance_fires_on_cycling_stream(self, cfg_params):
        """Greedy decode of a fixed random net cycles; once it does, every
        continuation is a bigram match and the spec path must emit more
        than one token per verify forward."""
        cfg, params = cfg_params
        _, ss = _engines(cfg, params)
        samp = SamplingParams(temperature=0.0, repetition_penalty=1.0,
                              max_tokens=40)
        out = _gen(ss, [[7, 7, 7, 7], [7, 7, 7, 7]], samp)
        assert out[0]["token_ids"] == out[1]["token_ids"]  # greedy, same row
        st = ss.spec_stats
        assert st["emitted"] / max(st["verify_steps"], 1) > 1.2, st

    def test_surplus_exhaustion_falls_back_to_plain(self, cfg_params):
        """A tiny surplus forces the mid-generation switch to the plain
        ring path; greedy outputs must still match the plain engine
        end-to-end (cache state carried across the switch)."""
        cfg, params = cfg_params
        plain, ss = _engines(cfg, params, spec_draft=4, spec_surplus=10)
        samp = SamplingParams(temperature=0.0, repetition_penalty=1.0,
                              max_tokens=32)
        prompts = [[5, 6, 7, 8], [20, 21, 22]]
        a = _gen(plain, prompts, samp)
        b = _gen(ss, prompts, samp)
        for x, y, p in zip(a, b, prompts):
            assert x["token_ids"] == y["token_ids"], p


class TestMultiWave:
    def test_multi_wave_greedy_bit_identical(self, cfg_params):
        """Serving waves (r5): more requests than slots — speculation
        engages once the last request is admitted, over a mix of
        mid-flight rows; greedy outputs must equal the plain engine's
        end-to-end across the rebinds (compact histories rebuilt per
        bind, shared cursor bounded by hole compaction)."""
        cfg, params = cfg_params
        base = dict(prompt_buckets=(64,), cache_dtype=jnp.float32,
                    max_slots=4)
        plain = InferenceEngine(params, cfg, spec_sample=False, **base)
        ss = InferenceEngine(params, cfg, spec_sample=True, spec_draft=4,
                             spec_surplus=64, **base)
        ss.spec_warmup = 0  # 24-token rows; default warmup would defer spec
        samp = SamplingParams(temperature=0.0, repetition_penalty=1.0,
                              max_tokens=24)
        prompts = [[7, 7, 7, 7], [5, 6, 7], [9, 9, 9], [4, 5, 6],
                   [20, 21, 22], [7, 7, 7], [30, 31, 32], [8, 9],
                   [11, 12, 13], [5, 5, 5]]  # 10 requests over 4 slots
        a = _gen(plain, prompts, samp)
        b = _gen(ss, prompts, samp)
        for x, y, p in zip(a, b, prompts):
            assert x["token_ids"] == y["token_ids"], p
        assert ss.spec_stats["verify_steps"] > 0, ss.spec_stats


class TestSampledDistribution:
    def test_temp1_statistics_match(self, cfg_params):
        """Temperature-1 top-p sampling: emitted sequences from the spec
        path follow the sequential sampler's distribution. Compare mean
        sequence length (EOS law) and mean per-token logprob over many
        seeds; both are smooth functionals of the sampling law."""
        cfg, params = cfg_params
        plain, ss = _engines(cfg, params)
        samp_kw = dict(temperature=1.0, top_p=0.95, repetition_penalty=1.0,
                       max_tokens=12)

        def collect(eng, n_seeds=24, rows=4):
            lens, lps = [], []
            for s in range(n_seeds):
                outs = _gen(eng, [[5, 6, 7, 8]] * rows,
                            SamplingParams(seed=1000 + s, **samp_kw),
                            return_logprobs=True)
                for o in outs:
                    lens.append(len(o["token_ids"]))
                    lps.extend(o["logprobs"])
            return np.asarray(lens, np.float64), np.asarray(lps, np.float64)

        len_a, lp_a = collect(plain)
        len_b, lp_b = collect(ss)
        # spec actually ran (different rng stream -> not bit-identical)
        assert ss.spec_stats["verify_steps"] > 0

        def close(a, b, label):
            se = np.sqrt(a.var() / len(a) + b.var() / len(b)) + 1e-9
            z = abs(a.mean() - b.mean()) / se
            assert z < 5.0, (label, a.mean(), b.mean(), z)

        close(len_a, len_b, "completion length")
        close(lp_a, lp_b, "per-token logprob")


class TestGSPOStepInvariance:
    def test_step_telemetry_statistically_unchanged(self, cfg_params):
        """Full GSPO steps with spec_rollout on/off: reward, KL and
        completion-length telemetry must agree statistically (lr=0 freezes
        the policy so every step is an iid rollout draw; ref_params is a
        DIFFERENT random init so KL is a nontrivial functional of the
        sampled sequences)."""
        from open_o3_video_tpu.train import gspo as G

        cfg, params = cfg_params
        ref_params = P.init(cfg, seed=1)

        def detok(ids):
            return " ".join(str(i) for i in ids)

        def tok_stat_reward(completions, **kw):
            out = []
            for c in completions:
                toks = [int(t) for t in c[0]["content"].split() if t.isdigit()]
                out.append(float(np.mean([t < 256 for t in toks])) if toks
                           else 0.0)
            return out

        def run(spec, n_steps=10):
            trainer = G.GSPOTrainer(
                params, ref_params, cfg,
                G.GSPOConfig(num_generations=8, max_completion_length=10,
                             max_prompt_length=64, learning_rate=0.0,
                             spec_rollout=spec,
                             release_engine_memory=False),
                detokenize=detok, reward_funcs=[tok_stat_reward],
                seed=7 if spec else 0,  # distinct rng streams by design
            )
            if spec:  # 10-token rollouts; default warmup would defer spec
                trainer.engine.spec_warmup = 0
            ms = [trainer.step({"input_ids": [5, 6, 7, 8, 9, 10]},
                               global_step=k, max_steps=n_steps)
                  for k in range(n_steps)]
            if spec:
                assert trainer.engine.spec_sample
                assert trainer.engine.spec_stats["verify_steps"] > 0
            return {k: np.asarray([m[k] for m in ms], np.float64)
                    for k in ("reward", "kl", "completion_length")}

        a = run(False)
        b = run(True)
        for key in ("reward", "kl", "completion_length"):
            x, y = a[key], b[key]
            se = np.sqrt(x.var() / len(x) + y.var() / len(y)) + 1e-9
            z = abs(x.mean() - y.mean()) / se
            assert z < 5.0, (key, x.mean(), y.mean(), z)


class TestReplayMode:
    def test_replay_emits_forced_stream(self, cfg_params):
        """Benchmark replay: emitted tokens == the forced streams, and a
        self-repeating stream gets drafts accepted (emitted/verify > 1.5)."""
        cfg, params = cfg_params
        _, ss = _engines(cfg, params)
        samp = SamplingParams(temperature=1.0, top_p=0.95, max_tokens=24,
                              seed=5)
        # period-3 cycling streams (different per row), no eos token
        tr = np.stack([
            np.tile([10 + r, 20 + r, 30 + r], 8) for r in range(3)
        ]).astype(np.int32)
        outs = ss.generate(
            [Request(input_ids=[5, 6, 7, 8])] * 3, samp, replay_tokens=tr
        )
        for r, o in enumerate(outs):
            # position 0 is the bind-time sample (real sampling); the
            # replayed stream takes over from position 1
            assert o["token_ids"][1:] == tr[r, 1:len(o["token_ids"])].tolist()
            assert len(o["token_ids"]) == 24
        st = ss.spec_stats
        assert st["emitted"] / max(st["verify_steps"], 1) > 1.5, st

    def test_compaction_keeps_spec_covering_whole_generation(self, cfg_params):
        """Worst-case acceptance (repetition-free replay streams) burns K1
        columns per emitted token; hole compaction must reclaim them so the
        spec loop covers EVERY token (zero plain-path fallback) whenever
        spec_surplus >= max_tokens — the invariant cc_min + K1 + live_rem
        <= ring then always holds after a compact. Before compaction
        existed, this config covered only ~surplus/K1 tokens."""
        cfg, params = cfg_params
        _, ss = _engines(cfg, params, spec_draft=4, spec_surplus=48)
        # This test pins the COMPACTION machinery, so the acceptance probe
        # (which would correctly revert these repetition-free streams to
        # plain decode — see test_probe_reverts_low_acceptance) is off.
        ss.spec_min_rate = 0.0
        samp = SamplingParams(temperature=1.0, top_p=0.95, max_tokens=48,
                              seed=11)
        rng = np.random.default_rng(3)
        tr = np.stack([
            rng.permutation(np.arange(10, 490))[:64] for _ in range(2)
        ]).astype(np.int32)
        outs = ss.generate(
            [Request(input_ids=[5, 6, 7]), Request(input_ids=[8, 9])],
            samp, replay_tokens=tr,
        )
        total = sum(len(o["token_ids"]) - 1 for o in outs)  # minus bind sample
        st = ss.spec_stats
        assert total == 2 * 47
        assert st["emitted"] == total, st  # every token emitted by the spec loop
        for r, o in enumerate(outs):
            assert o["token_ids"][1:] == tr[r, 1:48].tolist()

    def test_replay_random_stream_still_correct(self, cfg_params):
        """A repetition-free stream (worst case): every token still emitted
        in order, acceptance near zero."""
        cfg, params = cfg_params
        _, ss = _engines(cfg, params)
        samp = SamplingParams(temperature=1.0, top_p=0.95, max_tokens=16,
                              seed=6)
        rng = np.random.default_rng(0)
        tr = rng.permutation(np.arange(10, 490))[None, :64].astype(np.int32)
        out = ss.generate([Request(input_ids=[5, 6, 7])], samp,
                          replay_tokens=tr)[0]
        assert out["token_ids"][1:] == tr[0, 1:16].tolist()


class TestAcceptanceProbe:
    """The first spec segment of a group is a short acceptance probe; low
    tokens/verify/row reverts the group to plain decode (BENCH_r05 `worst`
    regression fix: compaction re-entry made zero-acceptance rollouts ~2x
    SLOWER than plain — the probe bounds the machinery's overhead to one
    short segment)."""

    def test_probe_reverts_low_acceptance(self, cfg_params):
        cfg, params = cfg_params
        _, ss = _engines(cfg, params, spec_surplus=96)
        ss.spec_probe = 8  # short probe so the 24-token run splits clearly
        rng = np.random.default_rng(7)
        # repetition-free streams -> acceptance ~0 -> rate ~1.0 < 1.35
        tr = np.stack([
            rng.permutation(np.arange(10, 490))[:64] for _ in range(2)
        ]).astype(np.int32)
        samp = SamplingParams(temperature=1.0, top_p=0.95, max_tokens=24,
                              seed=9)
        outs = ss.generate(
            [Request(input_ids=[5, 6, 7]), Request(input_ids=[8, 9])],
            samp, replay_tokens=tr,
        )
        st = ss.spec_stats
        assert st["probe_disabled"] == 1, st
        # outputs still full length: the plain path finished the group
        # after the probe. Replay forcing applies only to the SPEC loop,
        # so only the probe prefix tracks the forced stream; the rest is
        # real sampling on the plain path.
        for r, o in enumerate(outs):
            # real sampling on the tiny vocab can draw eos -> early finish
            assert (len(o["token_ids"]) == 24
                    or o["token_ids"][-1] == cfg.eos_token_id), o
            assert o["token_ids"][1:ss.spec_probe] == \
                tr[r, 1:ss.spec_probe].tolist()
        # the spec loop stopped at the probe: emitted well below the total
        assert st["emitted"] <= 2 * (ss.spec_probe + ss.spec_draft + 1), st

    def test_warmup_defers_speculation(self, cfg_params):
        """With spec_warmup=W the first W tokens of a group run the PLAIN
        path (prompt-lookup acceptance is back-loaded, so probing from
        token 0 wrongly reverts groups); speculation + replay forcing take
        over afterwards, continuing each row's stream from its own index."""
        cfg, params = cfg_params
        _, ss = _engines(cfg, params)
        ss.spec_warmup = 8
        ss.spec_min_rate = 0.0  # isolate warmup from the probe verdict
        tr = np.stack([
            np.tile([10 + r, 20 + r, 30 + r], 12) for r in range(2)
        ]).astype(np.int32)
        samp = SamplingParams(temperature=1.0, top_p=0.95, max_tokens=24,
                              seed=13)
        outs = ss.generate(
            [Request(input_ids=[5, 6, 7]), Request(input_ids=[8, 9])],
            samp, replay_tokens=tr,
        )
        st = ss.spec_stats
        # spec loop only covered the post-warmup tokens
        assert 0 < st["emitted"] <= 2 * (24 - 8 + ss.spec_draft + 1), st
        for r, o in enumerate(outs):
            # warmup tokens are real samples; the forced stream takes over
            # at each row's own emission index after the warmup
            assert len(o["token_ids"]) == 24 or o["token_ids"][-1] == \
                cfg.eos_token_id, o
            n = len(o["token_ids"])
            assert o["token_ids"][8:n] == tr[r, 8:n].tolist()

    def test_probe_keeps_high_acceptance(self, cfg_params):
        cfg, params = cfg_params
        _, ss = _engines(cfg, params)
        ss.spec_probe = 8
        # period-3 cycling streams: drafts accept, probe must NOT revert
        tr = np.stack([
            np.tile([10 + r, 20 + r, 30 + r], 12) for r in range(2)
        ]).astype(np.int32)
        samp = SamplingParams(temperature=1.0, top_p=0.95, max_tokens=24,
                              seed=9)
        outs = ss.generate(
            [Request(input_ids=[5, 6, 7]), Request(input_ids=[8, 9])],
            samp, replay_tokens=tr,
        )
        st = ss.spec_stats
        assert st["probe_disabled"] == 0, st
        assert st["emitted"] == sum(len(o["token_ids"]) - 1 for o in outs), st
        for r, o in enumerate(outs):
            assert o["token_ids"][1:] == tr[r, 1:24].tolist()
