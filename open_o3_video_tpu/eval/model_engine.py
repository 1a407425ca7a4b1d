"""Engine-backed eval model wrapper — the QwenVL_VLLM equivalent.

Same call contract as the reference wrapper (eval/models/model_vllm.py):

- ``__call__(video_paths, queries, query_image) -> (outputs, frames, fps[, shape])``
- ``run_images_scorer(msgs, images) -> int`` (0/1/2, -1 on anything else)
- ``inference_wo_process(inputs) -> str``

but inference runs on the TPU engine: requests stream through its
continuous-batching decode slots (the vLLM max_num_seqs analogue) and
sampling uses the same defaults (temperature from config, repetition
penalty 1.05).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence

import numpy as np

from ..data.processor import O3VideoProcessor
from ..data.video import process_vision_info
from ..engine import InferenceEngine, Request, SamplingParams
from ..models.qwen25vl import Qwen25VLConfig
from ..models.qwen25vl import params as P


class QwenVLEngine:
    def __init__(
        self,
        llm_name_or_params,
        rt_shape: bool = False,
        *,
        cfg: Optional[Qwen25VLConfig] = None,
        processor: Optional[O3VideoProcessor] = None,
        mesh=None,
        batch_axis=None,
        max_slots: Optional[int] = None,
        **llm_args,
    ):
        temperature = llm_args.pop("temperature", 0.0)
        max_tokens = llm_args.pop("max_tokens", 512)
        self.rt_shape = rt_shape
        self.video_max_pixels = llm_args.pop("video_max_pixels", 360 * 420)
        self.video_max_frames = llm_args.pop("video_max_frames", 16)
        self.max_num_seqs = llm_args.pop("max_num_seqs", 5)

        load_in_int8 = llm_args.pop("load_in_int8", False)
        load_in_int4 = llm_args.pop("load_in_int4", False)
        quantize_vision = llm_args.pop("quantize_vision", False)
        quantize_text = "int4" if load_in_int4 else load_in_int8
        if isinstance(llm_name_or_params, str):
            print("Start initialize the model.")
            # int8 streams decoder weights to ~9.5 GB so the full 7B + KV
            # arena fits one 16 GB chip (load_pretrained quantize_text);
            # int4 halves that again via the Pallas group-dequant kernel
            # (ops/int4.py, opt-in: extra rounding loss); quantize_vision
            # pairs with a8_prefill for the 2x MXU tower.
            params, cfg = P.load_pretrained(
                llm_name_or_params, cfg,
                quantize_text=quantize_text, quantize_vision=quantize_vision,
            )
            processor = processor or O3VideoProcessor.from_pretrained(llm_name_or_params)
        else:
            params = llm_name_or_params
            assert cfg is not None, "cfg required when passing raw params"
            processor = processor or O3VideoProcessor()
        self.cfg = cfg
        self.processor = processor
        # batch_axis="data" turns on the DP eval fleet: slot rows sharded
        # over the mesh data axis, one wave of requests per chip row-shard
        # (the reference's per-GPU worker fleet, test_vstar_multi_images.py:
        # 621-693, as ONE SPMD engine).
        engine_kw = {}
        if batch_axis is not None:
            engine_kw["batch_axis"] = batch_axis
        if max_slots is not None:
            engine_kw["max_slots"] = max_slots
        # Engine tuning knobs pass straight through (config yaml / CLI can
        # set e.g. prefix_cache_min or prefill_chunk per benchmark).
        for k in ("prompt_buckets", "cache_dtype", "decode_segment",
                  "prefill_chunk", "prefix_cache_min", "suffix_buckets",
                  "prefix_cache_entries", "decode_attn_impl", "max_kv_gb",
                  "long_prefill_threshold", "long_prefill_chunk", "a8_prefill",
                  "spec_decode", "spec_draft"):
            if k in llm_args:
                engine_kw[k] = llm_args.pop(k)
        if isinstance(engine_kw.get("cache_dtype"), str):
            # YAML configs carry strings; "fp8" halves KV HBM (long context)
            import jax.numpy as jnp

            engine_kw["cache_dtype"] = {
                "fp8": jnp.float8_e4m3fn, "float8_e4m3fn": jnp.float8_e4m3fn,
                "bf16": jnp.bfloat16, "bfloat16": jnp.bfloat16,
                "f32": jnp.float32, "float32": jnp.float32,
            }[engine_kw["cache_dtype"]]
        self.engine = InferenceEngine(params, cfg, mesh=mesh, **engine_kw)
        self.sampling = SamplingParams(
            temperature=temperature, repetition_penalty=1.05, max_tokens=max_tokens
        )
        print(f"Initialize model successfully with args {llm_args}")

    # ------------------------------------------------------------- internals

    def _requests_from_messages(self, messages_batch: Sequence[list]) -> list[Request]:
        from ..data.processor import IMAGE_PAD, VIDEO_PAD, VISION_END, VISION_START

        video_block = f"{VISION_START}{VIDEO_PAD}{VISION_END}"
        image_block = f"{VISION_START}{IMAGE_PAD}{VISION_END}"
        reqs = []
        for messages in messages_batch:
            text = self.processor.apply_chat_template(messages, add_generation_prompt=True)
            image_inputs, video_inputs, _ = process_vision_info(
                messages, return_video_kwargs=True
            )
            # Video runs as frames-as-images everywhere in this framework
            # (SURVEY §5.7 token-identity trick), so each native video-pad
            # block expands to one image block per frame.
            images: list[Any] = []
            if video_inputs:
                for vid in video_inputs:
                    if isinstance(vid, np.ndarray):
                        frames = [vid[i] for i in range(vid.shape[0])]
                    else:
                        frames = list(vid)
                    text = text.replace(video_block, image_block * len(frames), 1)
                    images.extend(frames)
            if image_inputs:
                images.extend(image_inputs)
            proc = self.processor(text, images=images or None)
            reqs.append(
                Request(
                    input_ids=proc.input_ids,
                    pixel_patches=proc.pixel_patches,
                    grid_thw=proc.grid_thw,
                    vision_token_id=self.cfg.image_token_id,
                )
            )
        return reqs

    def _generate_texts(self, requests: Sequence[Request]) -> list[str]:
        # The engine continuous-batches internally (max_slots decode slots
        # with queued admission), so all requests go down in one call.
        outs = self.engine.generate(list(requests), self.sampling)
        return [
            self.processor.decode(out["token_ids"], skip_special_tokens=True)
            for out in outs
        ]

    # ----------------------------------------------------------------- public

    def get_batch_messages(self, video_paths, queries, query_image):
        """Build per-item messages + decoded frames (reference:
        model_vllm.py:39-90)."""
        messages = []
        for video_path, query, image in zip(video_paths, queries, query_image):
            content = [
                {
                    "type": "video",
                    "video": video_path,
                    "max_pixels": self.video_max_pixels,
                    "max_frames": self.video_max_frames,
                },
                {"type": "text", "text": query},
            ]
            if image is not None:
                content.insert(1, {"type": "image", "image": image})
            messages.append([{"role": "user", "content": content}])
        _, video_inputs, video_kwargs = process_vision_info(messages, return_video_kwargs=True)
        fps = video_kwargs["fps"][0]
        return messages, video_inputs, fps

    def __call__(self, video_path, query, query_image, **kwargs):
        if not (isinstance(video_path, list) and isinstance(query, list)):
            raise ValueError("video_path and query must be list or str")
        messages, video_inputs, fps = self.get_batch_messages(video_path, query, query_image)
        frames = video_inputs[0]
        frame_shape = (frames.shape[3], frames.shape[2])
        reqs = self._requests_from_messages(messages)
        outputs = self._generate_texts(reqs)
        if self.rt_shape:
            return outputs, frames, fps, frame_shape
        return outputs, frames, fps

    def generate_paths(self, video_path, text_input, image, n_paths: int):
        """N sampled reasoning paths for ONE item in a single engine batch.

        The video is decoded/processed once and the N requests share its
        pixel arrays (the engine encodes them once per call) — the reference
        re-runs the full vLLM call per path (test_videomme.py:129-246).
        Returns (outputs, frames, fps, frame_shape)."""
        messages, video_inputs, fps = self.get_batch_messages(
            [video_path], [text_input], [image]
        )
        frames = video_inputs[0]
        frame_shape = (frames.shape[3], frames.shape[2])
        req = self._requests_from_messages(messages)[0]
        outputs = self._generate_texts([req] * n_paths)
        return outputs, frames, fps, frame_shape

    def generate_paths_batch(self, items: Sequence[tuple], n_paths: int):
        """K items x N paths in ONE engine batch.

        ``items``: [(video_path, text_input, image), ...]. Host preparation
        (video decode + resize + tokenize) runs in a thread pool (the
        native/cv2 decoders release the GIL); the K*N requests then stream
        through the engine's decode slots together — the in-process
        replacement for the reference's process-per-GPU eval fleet
        (test_videomme.py:315-345). Each item's N requests share its pixel
        arrays, so the vision tower encodes each video once.

        Returns one (outputs, frames, fps, frame_shape) tuple per item."""
        return self.generate_paths_prepared(self.prepare_paths_batch(items), n_paths)

    def prepare_paths_batch(self, items: Sequence[tuple]) -> list[tuple]:
        """Host phase of ``generate_paths_batch``: decode + resize +
        tokenize only (no device work), in a thread pool. The split lets a
        harness prepare item batch k+1 on a background thread while the
        engine runs batch k on the device (mcq_harness.iter_mcq_item_batches),
        hiding host video decode entirely in the steady state."""
        from concurrent.futures import ThreadPoolExecutor

        def prep(it):
            vp, txt, img = it
            messages, video_inputs, fps = self.get_batch_messages([vp], [txt], [img])
            frames = video_inputs[0]
            frame_shape = (frames.shape[3], frames.shape[2])
            req = self._requests_from_messages(messages)[0]
            return req, frames, fps, frame_shape

        with ThreadPoolExecutor(max_workers=min(4, max(1, len(items)))) as pool:
            prepped = list(pool.map(prep, items))
        # Pre-upload the patch tensors from this (prefetch) thread: the
        # host->device transfer then overlaps the engine's device phase of
        # the PREVIOUS item batch instead of serializing in vis_upload.
        bufs = self.engine.prestage_patches(
            [req.pixel_patches for req, _, _, _ in prepped]
        )
        return [
            (dataclasses.replace(req, pixel_patches=buf), frames, fps, shape)
            for (req, frames, fps, shape), buf in zip(prepped, bufs)
        ]

    def generate_paths_prepared(self, prepped: Sequence[tuple], n_paths: int):
        """Device phase of ``generate_paths_batch``: run the prepared
        requests (K items x n_paths) through one engine batch."""
        reqs = [r for r, _, _, _ in prepped for _ in range(n_paths)]
        texts = self._generate_texts(reqs)
        return [
            (texts[i * n_paths : (i + 1) * n_paths], frames, fps, shape)
            for i, (_, frames, fps, shape) in enumerate(prepped)
        ]

    def _scorer_request(self, msgs, images) -> Request:
        text = self.processor.apply_chat_template(msgs, add_generation_prompt=True)
        proc = self.processor(text, images=list(images) or None)
        return Request(input_ids=proc.input_ids, pixel_patches=proc.pixel_patches,
                       grid_thw=proc.grid_thw, vision_token_id=self.cfg.image_token_id)

    @staticmethod
    def _parse_score(answer: str) -> int:
        answer = answer.strip()
        return int(answer) if answer in ("0", "1", "2") else -1

    def run_images_scorer(self, msgs, images) -> int:
        """Self-scoring of evidence crops; int 0/1/2 or -1
        (reference: model_vllm.py:108-122)."""
        out = self.engine.generate([self._scorer_request(msgs, images)], self.sampling)[0]
        return self._parse_score(
            self.processor.decode(out["token_ids"], skip_special_tokens=True)
        )

    def run_images_scorer_batch(self, jobs: Sequence[tuple]) -> list[int]:
        """Batched evidence scoring: jobs = [(msgs, images), ...]."""
        reqs = [self._scorer_request(m, im) for m, im in jobs]
        outs = self.engine.generate(reqs, self.sampling)
        return [
            self._parse_score(
                self.processor.decode(o["token_ids"], skip_special_tokens=True)
            )
            for o in outs
        ]

    def prestage_raw_inputs(self, inputs_list: Sequence[dict]) -> None:
        """Patchify + pre-upload the image payloads of raw vLLM-style
        inputs IN PLACE, from a prefetch thread (see prepare_paths_batch's
        rationale): each dict gains ``_precomputed_vision`` with a
        device-resident patch buffer that ``_request_from_raw`` picks up.
        Inputs sharing one image list (V-STAR's 5 queries per item) share
        one buffer, preserving the engine's vision dedup."""
        staged: dict[int, Any] = {}
        order: list[int] = []
        for item in inputs_list:
            images = item.get("multi_modal_data", {}).get("image")
            if images is None or id(images) in staged:
                continue
            staged[id(images)] = self.processor.process_images(images)
            order.append(id(images))
        if not order:
            return
        bufs = self.engine.prestage_patches(
            [staged[k].pixel_patches for k in order]
        )
        for k, buf in zip(order, bufs):
            staged[k] = dataclasses.replace(staged[k], pixel_patches=buf)
        for item in inputs_list:
            images = item.get("multi_modal_data", {}).get("image")
            if images is not None:
                item["_precomputed_vision"] = staged[id(images)]

    def _request_from_raw(self, item: dict, vis_memo: Optional[dict] = None) -> Request:
        images = item.get("multi_modal_data", {}).get("image")
        pv = item.get("_precomputed_vision")
        if pv is None and images is not None and vis_memo is not None:
            # Queries sharing one frame list (V-STAR's 5 per item) reuse ONE
            # patchify; identical array objects then let the engine encode
            # the vision tower once for all of them.
            pv = vis_memo.get(id(images))
            if pv is None:
                pv = self.processor.process_images(images)
                vis_memo[id(images)] = pv
        proc = self.processor(item["prompt"], images=images, precomputed_vision=pv)
        return Request(input_ids=proc.input_ids, pixel_patches=proc.pixel_patches,
                       grid_thw=proc.grid_thw, vision_token_id=self.cfg.image_token_id)

    def inference_wo_process(self, inputs) -> str:
        """vLLM-style raw inputs: [{"prompt": str, "multi_modal_data":
        {"image": [...]}}] (reference: model_vllm.py:124-126)."""
        out = self.engine.generate([self._request_from_raw(inputs[0])], self.sampling)[0]
        return self.processor.decode(out["token_ids"], skip_special_tokens=True)

    def inference_wo_process_batch(self, inputs: Sequence[dict]) -> list[str]:
        """Batched variant: ALL raw inputs in one engine call (the engine
        continuous-batches across its decode slots internally)."""
        vis_memo: dict = {}
        reqs = [self._request_from_raw(item, vis_memo) for item in inputs]
        return self._generate_texts(reqs)
