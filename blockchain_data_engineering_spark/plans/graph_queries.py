"""graph_queries — filled in incrementally."""
