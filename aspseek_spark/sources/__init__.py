"""Sources & state tables (SURVEY.md §2.1): synthetic web gen, table IO."""
