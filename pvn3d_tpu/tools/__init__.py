"""Offline dataset tooling (mesh info generation, testset packing)."""
