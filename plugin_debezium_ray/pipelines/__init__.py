"""End-to-end jobs: replay (capture), snapshot load, streaming iterator."""
