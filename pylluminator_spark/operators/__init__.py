"""DataFrame-level operators: selectors, masks, range joins, dedup,
similarity search, and top-k helpers."""
