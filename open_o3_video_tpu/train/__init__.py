"""Training: SFT (cold start) and GSPO RL, with FSDP/TP sharding + Orbax IO."""
