"""Host-side utilities: config, image IO, profiling."""
