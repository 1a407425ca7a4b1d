"""Benchmark evaluation: V-STAR, VideoMME, WorldSense, VideoMMMU, TTS, judge."""
