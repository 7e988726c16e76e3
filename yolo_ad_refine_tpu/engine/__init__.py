"""Engine: validator, predictor, checkpointing, results containers."""
