"""Pure scalar functions (SURVEY.md §2.8) shared by engine UDFs and oracle."""
