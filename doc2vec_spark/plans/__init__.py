"""Physical-plan quality checks."""
