"""Column-level functions: URL keying, HTML extraction, robots matching."""
