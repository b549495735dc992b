"""Input pipeline: datasets, augmentation, preprocessing, synthetic data."""
