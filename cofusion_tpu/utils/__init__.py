"""Host-side utilities: profiling, export, trajectory evaluation."""
