"""Model families. Flagship: Qwen2.5-VL (vision tower + LLM decoder)."""
