"""Headline pipelines + the driver-facing query inventory."""
