"""Crawl plans: one micro-batch round + the multi-round resumable loop."""
