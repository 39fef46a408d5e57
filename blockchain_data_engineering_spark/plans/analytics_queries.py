"""analytics_queries — filled in incrementally."""
