"""Structured Streaming wrappers for the crawl engine."""
