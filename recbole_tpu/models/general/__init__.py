"""general recommender models."""
