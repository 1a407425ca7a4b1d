"""Compute ops: attention (XLA + Pallas), RoPE/M-RoPE, sampling, preprocessing."""
