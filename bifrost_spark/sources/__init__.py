"""Custom source/sink formats beyond Spark's built-ins."""
