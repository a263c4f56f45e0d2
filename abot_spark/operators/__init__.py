"""Crawl dataflow operators: decisions, dedup, politeness, ordering."""
