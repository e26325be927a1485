"""sequential recommender models."""
