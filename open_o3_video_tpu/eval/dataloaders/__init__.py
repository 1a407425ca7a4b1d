"""Benchmark dataloaders: VideoMME, WorldSense, VideoMMMU."""
