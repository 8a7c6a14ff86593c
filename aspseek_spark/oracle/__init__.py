"""Reference-semantics oracle (SURVEY.md §5.2) — pure Python, no Spark."""
