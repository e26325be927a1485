"""context recommender models."""
