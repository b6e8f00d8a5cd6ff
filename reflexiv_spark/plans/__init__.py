"""Driver-side planning utilities: staged pipelines with resume."""
