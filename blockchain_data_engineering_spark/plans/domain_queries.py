"""domain_queries — filled in incrementally."""
