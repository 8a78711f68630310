"""Engine operators beyond plain one-liner DataFrame calls."""
