"""Structured Streaming operators: schema-drift monitoring over snapshot
streams and watermarked windowed event rollups."""
