"""knowledge recommender models."""
