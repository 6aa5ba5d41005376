"""UDF / UDAF / UDTF surface (SURVEY.md §2.2 J)."""
