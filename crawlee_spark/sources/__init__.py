"""Sources: fixture generators, sitemap / URL-list ingestion."""
