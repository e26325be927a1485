"""External-library (decision tree) recommenders."""
