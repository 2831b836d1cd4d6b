"""Pure-numpy geometry kernel library (no Ray imports here)."""
