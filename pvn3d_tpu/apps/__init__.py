"""Command-line entry points (train / evaluate / demo / tools)."""
