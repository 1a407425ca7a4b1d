"""pjit-sharded inference engine (prefill + cached decode) — vLLM equivalent."""

from .engine import InferenceEngine, Request, SamplingParams

__all__ = ["InferenceEngine", "Request", "SamplingParams"]
