"""Spark operators (SURVEY.md §2): crawl core + webtext pipeline ops."""
